package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.QBench <name> [reps] —
  * uses SPARK_GRAFT_SF_DIR and SPARK_GRAFT_CPUS like Bench.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args(0).split(",").foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[qbench] $name rep$i rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
