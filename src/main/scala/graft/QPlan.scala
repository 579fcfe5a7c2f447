package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dumper: runMain graft.QPlan <name> — prints the
  * formatted physical plan of a declared query on SPARK_GRAFT_SF_DIR.
  */
object QPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    // println is fine here: driver-side diagnostic tool, not an operator
    println("[qplan-begin]")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    println("[qplan-end]")
    spark.stop()
  }
}
