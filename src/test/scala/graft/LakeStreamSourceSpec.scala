package graft

import java.io.File
import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** The streaming-source contract of graft.lake.LakeStreamSource:
  * manifest versions as offsets, per-version microbatch pacing, live
  * tailing across new commits, checkpointed exactly-once restart, and
  * rewrite (copy-on-write) detection.
  */
class LakeStreamSourceSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_lakestream_$tag").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  private def df(keys: Seq[Int], tag: String) =
    keys.toDF("k").select(col("k").cast("long").as("k"),
      concat(lit(tag), lit(":"), col("k")).as("v"))

  private def stream(path: String, opts: (String, String)*): DataFrame = {
    val r = spark.readStream.format("graft.lake.LakeStreamSource")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(path)
  }

  test("tails version-by-version: one microbatch per manifest with maxVersionsPerTrigger=1") {
    val path = freshDir("tail")
    val t = LakeTable.create(spark, path, df(1 to 10, "a").coalesce(1), Seq("k"))
    t.append(df(11 to 20, "b").coalesce(1))
    t.append(df(21 to 30, "c").coalesce(1))
    val batches = mutable.ArrayBuffer.empty[(Long, Set[String])]
    val q = stream(path, "maxVersionsPerTrigger" -> "1")
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches.synchronized { batches += ((id, b.select("v").as[String].collect().toSet)) }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // one batch per version, in commit order, each exactly that version's file
    assert(batches.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(batches(0)._2 == (1 to 10).map(k => s"a:$k").toSet)
    assert(batches(1)._2 == (11 to 20).map(k => s"b:$k").toSet)
    assert(batches(2)._2 == (21 to 30).map(k => s"c:$k").toSet)
  }

  test("keeps tailing while running: commits made after start arrive as new batches") {
    val path = freshDir("live")
    val t = LakeTable.create(spark, path, df(1 to 5, "a").coalesce(1), Seq("k"))
    val seen = mutable.Set.empty[String]
    val q = stream(path)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select("v").as[String].collect()
        seen.synchronized { seen ++= rows }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) == (1 to 5).map(k => s"a:$k").toSet)
      t.append(df(6 to 9, "b").coalesce(1))
      q.processAllAvailable()
      assert(seen.synchronized(seen.toSet) ==
        ((1 to 5).map(k => s"a:$k") ++ (6 to 9).map(k => s"b:$k")).toSet)
    } finally q.stop()
  }

  test("startingVersion skips the snapshot and a checkpoint restart is exactly-once") {
    val path = freshDir("ckpt")
    val out = freshDir("ckpt_out")
    val ckpt = freshDir("ckpt_log")
    val t = LakeTable.create(spark, path, df(1 to 100, "base").coalesce(1), Seq("k"))
    t.append(df(101 to 110, "b").coalesce(1))
    // startingVersion=1: the v1 snapshot is NOT emitted, only the tail
    val q1 = stream(path, "startingVersion" -> "1")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).select("v").as[String].collect().toSet ==
      (101 to 110).map(k => s"b:$k").toSet)
    // two more commits while the stream is down
    t.append(df(111 to 115, "c").coalesce(1))
    t.append(df(116 to 118, "d").coalesce(1))
    // restart from the same checkpoint: ONLY the unseen versions arrive
    val q2 = stream(path, "startingVersion" -> "1")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.parquet(out).select("v").as[String].collect()
    assert(all.length == all.toSet.size, "restart must not re-emit committed rows")
    assert(all.toSet == ((101 to 110).map(k => s"b:$k") ++
      (111 to 115).map(k => s"c:$k") ++ (116 to 118).map(k => s"d:$k")).toSet)
  }

  test("maxBytesPerTrigger paces admission by manifest byte sizes") {
    val path = freshDir("bytes")
    val t = LakeTable.create(spark, path, df(1 to 10, "a").coalesce(1), Seq("k"))
    t.append(df(11 to 20, "b").coalesce(1))
    t.append(df(21 to 5000, "big").coalesce(1)) // one skewed-large commit
    t.append(df(5001 to 5010, "d").coalesce(1))
    // added bytes per version, from disk (== the manifest-recorded sizes)
    def bytesOf(v: Int): Long = {
      val prev = if (v <= 1) Set.empty[String] else t.fileNames(v - 1).toSet
      t.fileNames(v).filterNot(prev).map(n => new File(path, n).length).sum
    }
    // budget admits v1+v2 together, not the big v3 on top
    val budget = bytesOf(1) + bytesOf(2) + bytesOf(3) / 2
    val batches = mutable.ArrayBuffer.empty[(Long, Long)]
    val q = stream(path, "maxBytesPerTrigger" -> budget.toString)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val n = b.count()
        batches.synchronized { batches += ((id, n)) }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // batch 0 = v1+v2 (fits the budget), batch 1 = v3 ALONE (oversized
    // commits still flow — at least one version per trigger), batch 2 = v4
    assert(batches.synchronized(batches.toSeq) ==
      Seq((0L, 20L), (1L, 4980L), (2L, 10L)),
      s"unexpected pacing: ${batches.synchronized(batches.toSeq)}")
  }

  test("byte pacing keeps a checkpointed restart exactly-once") {
    val path = freshDir("bytes_ckpt")
    val out = freshDir("bytes_out")
    val ckpt = freshDir("bytes_log")
    val t = LakeTable.create(spark, path, df(1 to 30, "a").coalesce(1), Seq("k"))
    t.append(df(31 to 60, "b").coalesce(1))
    t.append(df(61 to 90, "c").coalesce(1))
    // tiny budget → one version per microbatch (every commit oversized)
    def run(): Unit = {
      val q = stream(path, "maxBytesPerTrigger" -> "1")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 90)
    // commits while down; restart resumes from the checkpointed version
    t.append(df(91 to 95, "d").coalesce(1))
    t.append(df(96 to 99, "e").coalesce(1))
    run()
    val all = spark.read.parquet(out).select("v").as[String].collect()
    assert(all.length == all.toSet.size, "restart must not re-emit rows")
    assert(all.length == 99)
  }

  test("a copy-on-write rewrite mid-stream fails fast; ignoreChanges opts into re-emit") {
    val path = freshDir("rewrite")
    val t = LakeTable.create(spark, path, df(1 to 20, "a").coalesce(1), Seq("k"))
    def drain(opts: (String, String)*): Seq[String] = {
      val rows = mutable.ArrayBuffer.empty[String]
      val q = stream(path, opts: _*)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val vs = b.select("v").as[String].collect()
          rows.synchronized { rows ++= vs }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      rows.synchronized(rows.toSeq)
    }
    assert(drain().toSet == (1 to 20).map(k => s"a:$k").toSet)
    t.merge(df(Seq(5), "upd"), "k") // rewrites the only file
    // default: tailing across the rewrite is an explicit error
    val ex = intercept[StreamingQueryException] {
      val q = stream(path, "startingVersion" -> "1")
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex.getCause.getMessage.contains("rewritten"),
      s"unexpected failure: ${ex.getCause}")
    // ignoreChanges: the rewritten file's SURVIVORS re-emit (at-least-once)
    val relaxed = drain("startingVersion" -> "1", "ignoreChanges" -> "true")
    assert(relaxed.toSet ==
      ((1 to 20).filterNot(_ == 5).map(k => s"a:$k") :+ "upd:5").toSet)
  }

  test("schema fixed at stream start: post-evolution files null-fill under it") {
    val path = freshDir("evolve")
    val t = LakeTable.create(spark, path, df(1 to 5, "a").coalesce(1), Seq("k"))
    t.appendEvolve(df(6 to 8, "b").withColumn("extra", col("k") * 2))
    // stream declared from the CURRENT (evolved) manifest: old files
    // null-fill extra, new files carry it
    val rows = mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = stream(path)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        val vs = b.select("k", "extra").as[(Long, Option[Long])].collect()
        rows.synchronized { rows ++= vs }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val m = rows.synchronized(rows.toMap)
    assert((1 to 5).forall(k => m(k.toLong).isEmpty))
    assert((6 to 8).forall(k => m(k.toLong).contains(k * 2L)))
  }
}
