package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Bucketed tables: the shuffle-free co-located join.
  *
  * Both fact tables are written bucketed by the join key; the subsequent
  * join reads bucket-aligned files and needs NO exchange on either side —
  * at 100 TB this is the difference between a join that moves the whole
  * table over the network every query and one that never shuffles the
  * pre-bucketed data again. BucketSpec asserts the plan has no shuffle in
  * the spec (with broadcast disabled).
  */
object BucketQueries {

  val queries: Map[String, Q] = Map(
    "sink_bucketed_join" -> ((s, dir) => {
      // DROP alone is not enough: a fresh session's in-memory catalog has
      // no record of a previous run's managed tables, but their warehouse
      // directories survive on disk and block re-creation
      for (t <- Seq("graft_orders_bkt", "graft_lineitem_bkt")) {
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + "/" + t)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_bkt")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_bkt")
      s.table("graft_lineitem_bkt")
        .join(s.table("graft_orders_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(Tables.dec2(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    })
  )

  val oracle: Map[String, String] = Map(
    "sink_bucketed_join" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
