package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-bench scratchpad: decompose the stage costs of whichever query
  * is currently under the knife. runMain graft.QMicro
  *
  * Current target: TopKPerKeyExec (bounded heap, map-side partial)
  * vs the stock Exchange→Sort→Window→Filter rank-filter plan, on a
  * synthetic fact table big enough that shuffle volume dominates.
  */
object QMicro {
  def main(args: Array[String]): Unit = {
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
    // 20M WIDE rows (~300B payload), 1k keys, top-3 per key — the
    // "top-k documents per key" shape where the stock plan's per-key
    // Sort moves whole records and the bounded heap only copies k·keys
    def fact(s: SparkSession) = s.range(20000000L)
      .select((col("id") % 1000).as("k"),
        col("id").as("row_id"),
        (xxhash64(col("id")) % 1000000).cast("double").as("v"),
        repeat(concat(lit("payload-"), col("id").cast("string")), 15).as("doc"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("k")).orderBy(desc("v"), col("row_id"))
    def query(s: SparkSession) = fact(s)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    for (rep <- 1 to 2) {
      time(s"rep$rep window-sort-filter") { query(spark).count() }
      val cs = spark.newSession()
      graft.plans.TopKPerKey.install(cs)
      time(s"rep$rep topk-bounded-heap") { query(cs).count() }
    }
    spark.stop()
  }
}
