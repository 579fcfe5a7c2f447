package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench: decompose graph_triangles stage costs. runMain graft.TriMicro */
object TriMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = thunk
      println(f"[qmicro] $label rows=$c t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (rep <- 1 to 2) {
      val le = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = le.join(le.select(col("ok"), col("pk").as("pk2")), "ok")
        .filter(col("pk") < col("pk2"))
        .select(col("pk").as("u"), col("pk2").as("v"))
        .distinct()
      time(s"rep$rep edges") { e.count() }
      val ec = e.cache()
      time(s"rep$rep edges-cache") { ec.count() }
      val deg = ec.select(col("u").as("n")).unionAll(ec.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      time(s"rep$rep deg") { deg.count() }
      val ordU = struct(col("du").as("d"), col("u").as("id"))
      val ordV = struct(col("dv").as("d"), col("v").as("id"))
      val oriented = ec
        .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
        .select(
          when(ordU < ordV, col("u")).otherwise(col("v")).as("src"),
          when(ordU < ordV, col("v")).otherwise(col("u")).as("dst"))
      time(s"rep$rep oriented") { oriented.count() }
      val adj = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
        .cache()
      time(s"rep$rep adj") { adj.count() }
      val tri = oriented
        .join(adj.select(col("src").as("u2"), col("nbrs").as("nu")),
          col("src") === col("u2"))
        .join(adj.select(col("src").as("v2"), col("nbrs").as("nv")),
          col("dst") === col("v2"))
        .agg(sum(graft.functions.SortedIntersectSize(col("nu"), col("nv")))
          .as("n_triangles"))
      time(s"rep$rep tri") { tri.count() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
