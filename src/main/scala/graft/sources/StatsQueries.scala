package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Stats-informed (cost-based) planning: ANALYZE TABLE + CBO join
  * reorder.
  *
  * Spark's default planning is rule + file-size based; with catalog
  * statistics (`ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...]`)
  * and `spark.sql.cbo.{enabled,joinReorder.enabled}` the optimizer
  * reorders multi-way inner joins by estimated cardinality. The declared
  * query below is WRITTEN in the worst order — fact ⋈ fact first, the
  * selective dimension last — and relies on the cost model to rotate the
  * selective dimension⋈fact join to the bottom, shrinking the first
  * intermediate from |lineitem⋈orders| to |orders⋈σ(customer)|. At
  * 100 TB that reorder is the difference between shuffling the whole
  * fact-fact join output and shuffling a pre-filtered sliver; PlanSpec
  * asserts the rotated shape (the bottom-most join must not touch
  * lineitem) and that row-count stats are visible to the optimizer.
  *
  * CBO confs are scoped to a CHILD session (newSession — own SQLConf,
  * shared catalog + SparkContext) so no other declared query plans under
  * them.
  */
object StatsQueries {

  /** (Re)create the stats tables from parquet, ANALYZE them, and return a
    * CBO-enabled child session. Shared by the declared query and the plan
    * spec so both see the same catalog state.
    */
  private[graft] def cboSession(s0: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.SparkSession = {
    val s = s0.newSession()
    // managed-table leftovers from a previous JVM block saveAsTable (same
    // discipline as BucketQueries)
    for (t <- Seq("graft_stats_lineitem", "graft_stats_orders", "graft_stats_customer")) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir") + "/" + t)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .write.saveAsTable("graft_stats_lineitem")
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .write.saveAsTable("graft_stats_orders")
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      .write.saveAsTable("graft_stats_customer")
    // r15 optimization: no separate table-level ANALYZE pass — the
    // FOR COLUMNS command below computes and records sizeInBytes and
    // rowCount too (CommandUtils.analyzeTable runs inside
    // AnalyzeColumnCommand), so the plain COMPUTE STATISTICS scans were
    // three redundant jobs per invocation. CBO sees identical stats.
    s.sql("ANALYZE TABLE graft_stats_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    s.sql("ANALYZE TABLE graft_stats_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
    s.sql("ANALYZE TABLE graft_stats_customer COMPUTE STATISTICS FOR COLUMNS c_custkey, c_nationkey")
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s
  }

  val queries: Map[String, Q] = Map(
    "join_cbo_reorder" -> ((s0, dir) => {
      val s = cboSession(s0, dir)
      // written worst-first: lineitem ⋈ orders, THEN the selective
      // customer filter — CBO must rotate customer⋈orders to the bottom
      s.table("graft_stats_lineitem")
        .join(s.table("graft_stats_orders"), col("l_orderkey") === col("o_orderkey"))
        .join(s.table("graft_stats_customer").filter(col("c_nationkey") < 3),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_lines"),
          sum(Tables.dec2(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    })
  )

  val oracle: Map[String, String] = Map(
    "join_cbo_reorder" ->
      """SELECT c_mktsegment, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey < 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
