package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Vacuum-vs-reader and vacuum-vs-writer races, pinned interleavings.
  * The contract: vacuum never produces a PARTIAL or silently-wrong
  * result anywhere — a raced reader either completes on intact files or
  * fails with a clear missing-file/missing-version error; a raced
  * writer either commits a fully consistent snapshot or conflicts
  * cleanly; an in-flight writer's staged files are never collected.
  */
class LakeGcSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_gc_$tag").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  private def kv(r: Range) = r.toDF("k")
    .select(col("k").cast("long").as("k"), (col("k") % 7).cast("long").as("v"))

  test("vacuum under an in-flight time-travel read: clear error, never partial rows") {
    val t = LakeTable.create(spark, freshDir("rd"), kv(1 to 100).coalesce(1), Seq("k"))
    val vOld = t.currentVersion
    t.overwrite(kv(201 to 400).coalesce(2)) // v2 rewrites everything: v1 files dead
    // reader plans (resolves files) against the old snapshot FIRST —
    // this is the in-flight read
    val inFlight = t.readVersion(vOld)
    inFlight.queryExecution.executedPlan // force planning before the GC
    t.vacuum(retainVersions = 1)
    // the planned files are gone; executing the plan must now FAIL with
    // a missing-file error — 100 rows or an exception, never 0<n<100
    val outcome = scala.util.Try(inFlight.collect())
    outcome match {
      case scala.util.Success(rows) =>
        assert(rows.length == 100, s"partial read: ${rows.length} of 100 rows")
      case scala.util.Failure(e) =>
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.toString.toLowerCase).mkString(" | ")
        assert(chain.contains("filenotfound") || chain.contains("nosuchfile") ||
          chain.contains("does not exist"),
          s"raced read must fail with a missing-file error, got: $chain")
    }
    // the retained snapshot is untouched either way
    assert(t.read().count() == 200)
  }

  test("time travel to a vacuumed version fails with a clear missing-version error") {
    val t = LakeTable.create(spark, freshDir("tt"), kv(1 to 50).coalesce(1), Seq("k"))
    val vOld = t.currentVersion
    t.append(kv(51 to 60).coalesce(1))
    t.vacuum(retainVersions = 1)
    val e = intercept[Exception] { t.readVersion(vOld).collect() }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.toString.toLowerCase).mkString(" | ")
    assert(msg.contains("nosuchfile") || msg.contains("manifest") ||
      msg.contains("version") || msg.contains("does not exist"),
      s"expected a clean missing-version error, got: $msg")
    assert(t.read().count() == 60)
  }

  test("vacuum spares a concurrent writer's staged files (pinned staging window)") {
    val t = LakeTable.create(spark, freshDir("stg"), kv(1 to 100).coalesce(1), Seq("k"))
    t.overwrite(kv(1 to 100).coalesce(1)) // make v1's files dead
    // pin the exact racy window: files moved into the table root, no
    // manifest yet (what stage() produces between move and commit)
    kv(500 to 599).coalesce(1).write.parquet(s"${t.path}/_staging_race")
    val part = new File(s"${t.path}/_staging_race").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(t.path, "part-racewriter00-00000.parquet"))
    val deleted = t.vacuum(retainVersions = 1)
    // dead v1 files go; the in-flight staged file stays
    assert(deleted.nonEmpty)
    assert(!deleted.contains("part-racewriter00-00000.parquet"))
    assert(Files.exists(Paths.get(t.path, "part-racewriter00-00000.parquet")))
  }

  test("rebasing writer racing vacuum: serializable result or clean conflict, 3x") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    for (round <- 1 to 3) {
      val t = LakeTable.create(spark, freshDir(s"wr$round"),
        kv(1 to 200).coalesce(1), Seq("k"))
      t.append(kv(201 to 400).coalesce(1))
      t.deleteWhere(col("k") > 390) // some history for vacuum to drop
      val gate = new java.util.concurrent.CountDownLatch(1)
      val fWriter = Future {
        gate.await()
        // full mutation pipeline: stage, then commit with rebase
        scala.util.Try(t.merge(kv(100 to 110).toDF("k", "v")
          .select(col("k"), (col("v") + 1000).as("v")), "k"))
      }
      val fVacuum = Future {
        gate.await()
        scala.util.Try(t.vacuum(retainVersions = 1))
      }
      gate.countDown()
      val Seq(wr, vac) = Await.result(Future.sequence(Seq(fWriter, fVacuum)), 120.seconds)
      // vacuum never corrupts: whatever interleaving happened, the head
      // snapshot must be fully readable and internally consistent
      val finalRows = t.read().select("k", "v").as[(Long, Long)].collect().toMap
      assert(finalRows.keySet.size == finalRows.size)
      assert((1L to 390L).forall(finalRows.contains),
        s"round $round lost base rows")
      wr match {
        case scala.util.Success(_) =>
          assert((100L to 110L).forall(k => finalRows(k) == k % 7 + 1000),
            s"round $round: merge committed but its rows are not visible")
        case scala.util.Failure(e) =>
          // a clean conflict is acceptable; silent corruption is not
          assert(e.isInstanceOf[graft.lake.ConcurrentWriteConflictException] ||
            e.getMessage != null, s"round $round writer failed unclearly: $e")
          assert((100L to 110L).forall(k => finalRows(k) == k % 7),
            s"round $round: merge failed but partially applied")
      }
      assert(vac.isSuccess, s"round $round vacuum threw: $vac")
    }
  }
}
