package graft

import org.apache.spark.sql.SparkSession

/** Scratchpad probe — rewrite freely while iterating on a query; the
  * declared behavior lives in the operator packs, never here. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("agg_basic")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val df = SparkEntry.queries(name)(s, dir)
    df.show(20, truncate = false)
    println(df.queryExecution.executedPlan.toString.take(4000))
    s.stop()
  }
}
