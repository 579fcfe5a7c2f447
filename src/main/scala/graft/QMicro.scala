package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench scratchpad: decompose the stage costs of whichever query
  * is currently under the knife. runMain graft.QMicro
  *
  * Current target: the lake family's per-commit constant — append and
  * rewrite cost before/after fusing the stats job into the staged write.
  */
object QMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(thunk: => T): T = {
      val t0 = System.nanoTime()
      val r = thunk
      println(f"[qmicro] $label t=${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val b = graft.Tables.orders(spark, dir).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("price"))
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_rt/qmicro_lake"
    def wipe(): Unit = {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally walk.close()
      }
    }
    for (rep <- 1 to 3) {
      wipe()
      val t = time(s"rep$rep create") {
        graft.lake.LakeTable.create(spark, root,
          b.filter(col("k") % 23 === 0).coalesce(1), Seq("k"))
      }
      time(s"rep$rep 21-appends") {
        for (i <- 1 to 21) t.append(b.filter(col("k") % 23 === i).coalesce(1))
      }
      time(s"rep$rep deleteWhere") { t.deleteWhere(col("k") % 2 === 1) }
      time(s"rep$rep final-agg") {
        t.read().agg(count(lit(1)), sum(col("price"))).collect()
      }
    }
    spark.stop()
  }
}
