package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Bloom-filter file index (LakeTable.buildBloomIndex /
  * bloomPrunedRead): equality pruning on columns whose [min,max]
  * ranges cannot skip anything.
  */
class LakeBloomSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_bloom_$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  /** Scrambled long key: every file's range covers every probe, so only
    * the bloom can prune. 8 files of 1k rows.
    */
  private def scrambled(tag: String): LakeTable = {
    val df = spark.range(0, 8000)
      .select(pmod(col("id") * 2654435761L, lit(1000003L)).as("sk"),
        concat(lit("v"), col("id")).as("v"))
      .repartition(8)
    LakeTable.create(spark, freshDir(tag), df, Seq("sk"))
  }

  test("bloom index prunes files min/max cannot, and the read stays exact") {
    val t = scrambled("prune")
    t.buildBloomIndex(Seq("sk"))
    // a present value: scrambled key of id=4321
    val probe = (4321L * 2654435761L) % 1000003L
    val expected = t.read().filter(col("sk") === probe).count()
    assert(expected >= 1)
    val nCand = t.bloomCandidateCount("sk", probe)
    assert(nCand < 8, s"bloom should skip some of the 8 files, probed $nCand")
    assert(t.bloomPrunedRead("sk", probe).filter(col("sk") === probe)
      .count() === expected)
    // an absent value — at ~1% FPP over 8 files, usually 0 candidates,
    // always exact
    val absent = 999999L
    assert(t.bloomPrunedRead("sk", absent).filter(col("sk") === absent)
      .count() === 0)
  }

  test("string columns index and probe through the same hash path") {
    val df = spark.range(0, 2000)
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .repartition(4)
    val t = LakeTable.create(spark, freshDir("str"), df, Seq("id"))
    t.buildBloomIndex(Seq("h"))
    val probeDf = spark.range(777, 778)
      .select(md5(col("id").cast("string"))).head().getString(0)
    assert(t.bloomCandidateCount("h", probeDf) < 4)
    assert(t.bloomPrunedRead("h", probeDf).filter(col("h") === probeDf)
      .count() === 1)
  }

  test("files appended after the build stay conservatively unpruned") {
    val t = scrambled("append")
    t.buildBloomIndex(Seq("sk"))
    t.append(Seq((999999L, "late")).toDF("sk", "v").coalesce(1))
    // absent-from-indexed-files value that IS in the new file: the read
    // must still find it (no bitmap → always candidate)
    assert(t.bloomPrunedRead("sk", 999999L).filter(col("sk") === 999999L)
      .count() === 1)
    // rebuilding covers the new file too
    t.buildBloomIndex(Seq("sk"))
    val n = t.bloomCandidateCount("sk", 999999L)
    assert(n === 1, s"after rebuild only the late file matches, got $n")
  }

  test("NULLs are not indexed; all-NULL files prune on any probe") {
    val df = Seq((Some(10L), "a"), (Some(20L), "b")).toDF("k", "v").coalesce(1)
    val t = LakeTable.create(spark, freshDir("nulls"), df, Seq.empty)
    t.append(Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2"))
      .toDF("k", "v").coalesce(1))
    t.buildBloomIndex(Seq("k"))
    assert(t.bloomCandidateCount("k", 10L) === 1)
    assert(t.bloomPrunedRead("k", 10L).filter(col("k") === 10L).count() === 1)
  }

  test("the bloom survives the manifest round-trip and column rename") {
    val t = scrambled("rt")
    t.buildBloomIndex(Seq("sk"))
    val probe = (100L * 2654435761L) % 1000003L
    val before = t.bloomCandidateCount("sk", probe)
    val t2 = LakeTable.forPath(spark, t.path) // fresh manifest parse
    assert(t2.bloomCandidateCount("sk", probe) === before)
    t2.renameColumn("sk", "scrambled")
    assert(t2.bloomCandidateCount("scrambled", probe) === before,
      "bloom keys are physical — renames must not lose the index")
  }
}
