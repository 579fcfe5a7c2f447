package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** §2.9 Structured Streaming jobs.
  *
  * Each job builds a readStream → transform → memory-sink pipeline and
  * runs it to completion with Trigger.AvailableNow (batch-like semantics
  * over whatever data is present — the idiom for testable streaming).
  * The aggregation expressions are shared shapes with the oracle-checked
  * batch twins in StreamBatchQueries; specs assert stream == batch.
  *
  * At scale these jobs run unmodified against a real source (Kafka/files
  * arriving): state is partitioned by grouping key in the state store,
  * watermarks bound state size, and AvailableNow becomes a real trigger.
  */
object StreamingJobs {

  /** Raw parquet schema of events.parquet under nanosAsLong (ts: long ns). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of an events parquet directory with the ns→µs fix. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventsRawSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Run `body` with spark.sql.shuffle.partitions temporarily set to `n`.
    * Stateful streaming creates one state-store instance per shuffle
    * partition per microbatch; at test scale 32 of them is pure
    * file/maintenance overhead. A real deployment sizes this to cluster
    * cores (Conf.recommended) — the value is pinned into the checkpoint
    * at first start, which is why it must be set before `.start()`.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  private def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Tumbling 1h per-user counts — streaming twin of stream_tumbling_batch. */
  def tumbling(spark: SparkSession, dir: String, sinkName: String = "stream_tumbling"): DataFrame = {
    val agg = readEventsStream(spark, dir)
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(col("user_id"), col("window.start").as("win_start"), col("n"), col("sum_value"))
    withStatePartitions(spark, 8) { runToMemory(agg, sinkName, OutputMode.Complete()) }
  }

  /** Tumbling agg with a 10-minute watermark in append mode; late rows
    * whose window closed before the watermark are dropped. Generic over
    * any events-shaped streaming source; returns the running query so a
    * spec can drive multiple MemoryStream batches through it.
    */
  def watermarkedTumblingQuery(events: DataFrame, sinkName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("window.start").as("win_start"), col("n"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Per-user session windows with a 30-minute gap. */
  def sessionWindows(spark: SparkSession, dir: String, sinkName: String = "stream_session"): DataFrame = {
    val agg = readEventsStream(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("n"))
    withStatePartitions(spark, 8) { runToMemory(agg, sinkName, OutputMode.Complete()) }
  }

  /** Streaming exact dedup on event_id bounded by a watermark; returns
    * the running query for multi-batch driving.
    */
  def streamingDedupQuery(events: DataFrame, sinkName: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("event_id"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append())
      .start()

  /** Arbitrary stateful op: running per-user event count via
    * mapGroupsWithState (state = count so far, emitted per batch).
    */
  def statefulRunningCount(spark: SparkSession, dir: String,
      sinkName: String = "stream_stateful"): DataFrame = {
    import spark.implicits._
    val updateFn = (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) => {
      val prev = state.getOption.getOrElse(0L)
      val total = prev + rows.size
      state.update(total)
      (userId, total)
    }
    val agg = readEventsStream(spark, dir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateFn)
      .toDF("user_id", "n_events")
    withStatePartitions(spark, 8) { runToMemory(agg, sinkName, OutputMode.Update()) }
  }
}
