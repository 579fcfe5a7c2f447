package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratchpad probe: stream-stream outer join batch/watermark behavior. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = graft.streaming.StreamingDeclared.stagedEventsSentinelDir(spark, sf)
    println(s"[qprobe] staged dir=$dir files:")
    new java.io.File(dir).listFiles().sortBy(_.getName).foreach(f =>
      println(s"[qprobe]   ${f.getName} mtime=${f.lastModified}"))
    def src() = graft.Tables.normalizeEventsTs(
      spark.readStream.schema(graft.streaming.StreamingJobs.eventsRawSchema(spark, dir))
        .option("maxFilesPerTrigger", "1").parquet(dir))
    val joined = graft.streaming.StreamingJobs.clickPurchaseJoin(
      src().filter(col("event_type") === "click"),
      src().filter(col("event_type") === "purchase"),
      joinType = "left_outer")
    val q = graft.streaming.StreamingJobs.withStatePartitions(spark, 8) {
      joined.writeStream.format("memory").queryName("probe_outer")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[qprobe] batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}")
    }
    val out = spark.table("probe_outer").filter(col("click_id") >= 0)
    println(s"[qprobe] out rows=${out.count()} nulls=${out.filter(col("purchase_id").isNull).count()}")
    val batch = graft.Tables.events(spark, sf)
    val c = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val p2 = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val exp = c.join(p2, Seq("user_id"), "left")
    val expect = c.join(p2.withColumnRenamed("user_id", "u2"),
        col("u2") === col("user_id") && col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 10 MINUTES"), "left")
    println(s"[qprobe] expected rows=${expect.count()}")
    val missing = expect.select(col("click_id"), col("purchase_id"))
      .exceptAll(out.select(col("click_id"), col("purchase_id")))
    println("[qprobe] missing:")
    missing.show(10, false)
    spark.stop()
  }
}
