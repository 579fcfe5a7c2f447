package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 Scans / sources / sinks.
  *
  * scan_project / scan_pushdown are written so Catalyst pushes the
  * projection and predicate into the vectorized parquet reader (verified
  * via explain in ScanSpec) — at 100 TB these queries read only the
  * referenced columns / row groups, not the table.
  *
  * Roundtrip queries write to a session-scoped temp dir: this tests the
  * CSV/JSON source+sink code paths; the oracle reads the original parquet
  * (the roundtrip is lossless for int/string columns).
  */
object ScanQueries {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_rt/$name"

  val queries: Map[String, Q] = Map(
    "scan_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (Tables.dec2(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("net"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "scan_pushdown" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "src_csv_roundtrip" -> ((s, dir) => {
      val path = tmp("nation_csv")
      Tables.nation(s, dir).write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      s.read.schema(schema).option("header", "true").csv(path)
        .orderBy(col("n_nationkey"))
    }),

    "src_json_roundtrip" -> ((s, dir) => {
      val path = tmp("region_json")
      Tables.region(s, dir).write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType)))
      s.read.schema(schema).json(path)
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    }),

    // ORC source+sink path (the second columnar format Spark ships with
    // a vectorized reader for); lossless for int/string/double columns
    "src_orc_roundtrip" -> ((s, dir) => {
      val path = tmp("supplier_orc")
      Tables.supplier(s, dir).write.mode("overwrite").orc(path)
      s.read.orc(path)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          Tables.dec2(col("s_acctbal")).cast("double").as("s_acctbal"))
        .orderBy(col("s_suppkey"))
    }),

    "sink_parquet_partitioned" -> ((s, dir) => {
      val path = tmp("li_part")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        // co-locate each output partition into one task → 3 files instead
        // of tasks×3 tiny files (and a 4× faster read-back)
        .repartition(col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
      s.read.parquet(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    })
  )

  val oracle: Map[String, String] = Map(
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_returnflag
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "src_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",

    "src_json_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "src_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,

    "sink_parquet_partitioned" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
