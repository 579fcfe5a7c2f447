package graft.streaming

import graft.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** §2.9 streaming jobs as declared queries: each stages the events file
  * into a directory, runs the REAL streaming engine (FileStreamSource →
  * state store → memory sink, Trigger.AvailableNow) and returns the sink
  * table. Non-oracle (DuckDB has no streams) — the driver records a
  * rows-only check; semantics (watermark drops, stream==batch) are
  * spec-tested with crafted MemoryStream batches in StreamingSpec.
  */
object StreamingDeclared {

  /** Stage the single events parquet file into a directory (file stream
    * sources list directories) — done once per (jvm, sfDir).
    */
  private def stagedEventsDir(sfDir: String): String = {
    val hash = Integer.toHexString(sfDir.hashCode)
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_stream_src_$hash")
    java.nio.file.Files.createDirectories(dir)
    val dst = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(dst)) {
      java.nio.file.Files.copy(java.nio.file.Paths.get(sfDir, "events.parquet"), dst)
    }
    dir.toString
  }

  private var sinkCounter = 0
  private def sinkName(base: String): String = synchronized {
    sinkCounter += 1; s"${base}_$sinkCounter"
  }

  val queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, dir) =>
      StreamingJobs.tumbling(s, stagedEventsDir(dir), sinkName("q_stream_tumbling"))
        .orderBy(col("user_id"), col("win_start"))),

    // stream-static enrichment join; single-microbatch AvailableNow run
    // makes the result deterministic → oracle-checked directly
    "stream_static_join" -> ((s, dir) =>
      StreamingJobs.streamStaticJoin(s, stagedEventsDir(dir),
          s"$dir/customer.parquet", sinkName("q_stream_static_join"))
        .orderBy(col("c_mktsegment"))),

    // stream-stream watermarked inner join with a time-bounded condition
    "stream_stream_join" -> ((s, dir) =>
      StreamingJobs.streamStreamJoin(s, stagedEventsDir(dir),
          sinkName("q_stream_stream_join"))
        .orderBy(col("click_id"), col("purchase_id"))),

    "stream_session" -> ((s, dir) =>
      StreamingJobs.sessionWindows(s, stagedEventsDir(dir), sinkName("q_stream_session"))
        .orderBy(col("user_id"), col("sess_start"))),

    "stream_stateful" -> ((s, dir) =>
      StreamingJobs.statefulRunningCount(s, stagedEventsDir(dir), sinkName("q_stream_stateful"))
        .orderBy(col("user_id"))),

    "stream_watermark_late" -> ((s, dir) => {
      // single-batch file run: nothing is late, but the watermarked
      // append-mode pipeline (state + eviction logic) executes for real;
      // late-drop behavior itself is spec-tested batch-by-batch
      val name = sinkName("q_stream_watermark")
      StreamingJobs.withStatePartitions(s, 8) {
        val q = StreamingJobs.watermarkedTumblingQuery(
          StreamingJobs.readEventsStream(s, stagedEventsDir(dir))
            .withColumn("ts", col("ts")), name)
        try q.processAllAvailable() finally q.stop()
      }
      s.table(name).orderBy(col("user_id"), col("win_start"))
    }),

    "stream_stateful_tws" -> ((s, dir) =>
      StreamingJobs.statefulRunningCountTws(s, stagedEventsDir(dir),
          sinkName("q_stream_stateful_tws"))
        .orderBy(col("user_id"))),

    // deterministic unbounded source (rate-micro-batch batch 0) — the
    // one streaming query DuckDB can oracle: values are 0..9999 exactly
    "stream_rate" -> ((s, dir) =>
      StreamingJobs.rateDemo(s, 10000, sinkName("q_stream_rate"))
        .orderBy(col("bucket"))),

    "stream_dedup" -> ((s, dir) => {
      val name = sinkName("q_stream_dedup")
      StreamingJobs.withStatePartitions(s, 8) {
        val events = StreamingJobs.readEventsStream(s, stagedEventsDir(dir))
        val q = events
          .withWatermark("ts", "10 minutes")
          .dropDuplicates(Seq("event_id"))
          .select(col("event_id"), col("user_id"), col("ts"))
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      s.table(name).orderBy(col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "stream_static_join" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "stream_stream_join" ->
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_type = 'click'
        |  AND b.event_type = 'purchase'
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "stream_rate" ->
      """SELECT CAST(value % 10 AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(value) AS BIGINT) AS sum_value
        |FROM (SELECT unnest(generate_series(0, 9999)) AS value)
        |GROUP BY 1 ORDER BY bucket""".stripMargin)
}
