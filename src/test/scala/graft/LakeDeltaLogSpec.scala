package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** The manifest DELTA LOG: commits publish O(changed-files) deltas,
  * every CheckpointInterval-th version publishes a full checkpoint,
  * and every snapshot reconstructs identically across the boundary —
  * the property that keeps commit cost flat in table size at 100 TB.
  */
class LakeDeltaLogSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_dlog_$tag").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  private def df(keys: Seq[Int], tag: String) =
    keys.toDF("k").select(col("k").cast("long").as("k"),
      concat(lit(tag), lit(":"), col("k")).as("v"))

  private def logFiles(path: String): Seq[String] =
    Option(new File(path, "_graft_log").list())
      .map(_.toSeq.filter(_.startsWith("v")).sorted).getOrElse(Nil)

  private def snapshot(t: LakeTable, v: Int): Map[Long, String] =
    t.readVersion(v).as[(Long, String)].collect().toMap

  test("commits are deltas, checkpoints land on the interval, every version reconstructs") {
    val path = freshDir("cad")
    val t = LakeTable.create(spark, path, df(1 to 20, "a").coalesce(1), Seq("k"))
    // record the expected contents version by version while committing
    // a mix of appends, copy-on-write mutations, and a merge across
    // TWO checkpoint boundaries (v10, v20)
    val expected = scala.collection.mutable.Map(
      1 -> (1 to 20).map(k => k.toLong -> s"a:$k").toMap)
    var state = expected(1)
    for (v <- 2 to 22) {
      v % 4 match {
        case 0 =>
          t.append(df(Seq(100 + v), s"ap$v").coalesce(1))
          state = state + ((100L + v) -> s"ap$v:${100 + v}")
        case 1 =>
          // delete a key that EXISTS (a no-candidate delete is a no-op
          // commit-wise — stats pruning returns without a new version)
          t.deleteWhere(col("k") === lit((v - 3).toLong))
          state = state - (v - 3).toLong
        case 2 =>
          t.merge(df(Seq(v), s"up$v").coalesce(1), "k")
          state = state + (v.toLong -> s"up$v:$v")
        case _ =>
          t.updateWhere(col("k") === lit(1L), Map("v" -> lit(s"u$v:1")))
          state = if (state.contains(1L)) state + (1L -> s"u$v:1") else state
      }
      assert(t.currentVersion == v)
      expected(v) = state
    }
    // log-file shape: v1 + interval multiples are checkpoints, the
    // rest are deltas
    val names = logFiles(path)
    val ckpt = names.filter(_.endsWith(".manifest")).map(_.substring(1, 9).toInt)
    val deltas = names.filter(_.endsWith(".delta")).map(_.substring(1, 9).toInt)
    assert(ckpt.toSet == Set(1, 10, 20), s"checkpoints at $ckpt")
    assert(deltas.toSet == ((2 to 22).toSet -- Set(10, 20)), s"deltas at $deltas")
    // EVERY retained version reconstructs to exactly its recorded state
    // (including versions straddling a checkpoint and the tail past one)
    for (v <- 1 to 22)
      assert(snapshot(t, v) == expected(v), s"version $v mismatch")
    // a fresh handle (no in-memory state) sees the same
    val t2 = LakeTable.forPath(spark, path)
    assert(snapshot(t2, 22) == expected(22))
    assert(t2.history().map(_.version) == (1 to 22))
  }

  test("a changed entry (DV attach) crosses the delta as remove+add of the same name") {
    val path = freshDir("dv")
    val t = LakeTable.create(spark, path, df(1 to 50, "a").coalesce(1), Seq("k"))
    t.deleteWhereMoR(col("k") <= lit(5L)) // v2: same file name, +dv sidecar
    assert(t.currentVersion == 2)
    assert(logFiles(path).exists(_ == "v00000002.delta"))
    assert(snapshot(t, 2).keySet == (6 to 50).map(_.toLong).toSet)
    // the delta carries the re-added entry with its sidecar; a fresh
    // reader reconstructs the masked snapshot
    val t2 = LakeTable.forPath(spark, path)
    assert(snapshot(t2, 2).keySet == (6 to 50).map(_.toLong).toSet)
    assert(snapshot(t2, 1).keySet == (1 to 50).map(_.toLong).toSet)
  }

  test("vacuum checkpoints the oldest retained version before dropping its chain") {
    val path = freshDir("vac")
    val t = LakeTable.create(spark, path, df(1 to 10, "a").coalesce(1), Seq("k"))
    for (v <- 2 to 15) t.append(df(Seq(100 + v), s"b$v").coalesce(1))
    assert(t.currentVersion == 15)
    val beforeVacuum = snapshot(t, 12)
    // retain 4 → keep 12..15; 12 exists only as a delta before vacuum
    assert(logFiles(path).contains("v00000012.delta"))
    t.vacuum(4)
    val names = logFiles(path)
    assert(names.contains("v00000012.manifest"),
      s"oldest retained version must be checkpointed, got $names")
    assert(!names.exists(n => n.substring(1, 9).toInt < 12),
      s"dropped versions must leave the log, got $names")
    // time travel to the new floor still works and is unchanged
    assert(snapshot(LakeTable.forPath(spark, path), 12) == beforeVacuum)
    intercept[IllegalArgumentException](t.readVersion(11))
    // and the table keeps committing fine past the vacuum
    t.append(df(Seq(999), "c").coalesce(1))
    assert(t.currentVersion == 16)
    assert(snapshot(t, 16).contains(999L))
  }

  test("commit cost is O(changed files): a 50k-file table's delta is control-plane tiny") {
    // synthetic manifest: 50k entries committed as the v1 checkpoint,
    // then one small append committed as a delta — the delta must be
    // O(appended files) in BYTES (the latency follows the bytes)
    val path = freshDir("big")
    val t = LakeTable.create(spark, path, df(1 to 10, "a").coalesce(1), Seq("k"))
    val synthetic = (1 to 50000).map(i => f"synthetic-$i%06d.parquet")
    graft.lake.LakeTestAccess.commitClonedEntries(t, 2, "synthetic", synthetic)
    // v2 is a delta of 50k adds (unavoidable — they ARE the change);
    // v3 appends ONE entry on top of the 50k-file snapshot
    graft.lake.LakeTestAccess.commitClonedEntries(t, 3, "tinyAppend",
      synthetic :+ "one-more.parquet")
    val log = new File(path, "_graft_log")
    val v3bytes = new File(log, "v00000003.delta").length()
    val v2bytes = new File(log, "v00000002.delta").length()
    assert(v2bytes > 1000000L, s"50k adds are data-sized: $v2bytes")
    assert(v3bytes < 2048L,
      s"one-file delta must be O(changed), got $v3bytes bytes")
    // reconstruction at the head sees all 50,001 synthetic files
    assert(graft.lake.LakeTestAccess.filesCount(t, 3) == 50001)
    // and a point mutation's commit latency is flat: time a delta
    // commit against the 50k-file snapshot — reported, not asserted
    // (host timing); the BYTES are the pin
    val t0 = System.nanoTime()
    graft.lake.LakeTestAccess.commitClonedEntries(t, 4, "tinyAppend2",
      synthetic ++ Seq("one-more.parquet", "two-more.parquet"))
    val ms = (System.nanoTime() - t0) / 1e6
    info(f"delta commit against 50k-file snapshot: $ms%.1f ms, $v3bytes bytes")
    assert(new File(log, "v00000004.delta").length() < 2048L)
  }
}
