package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.CsvSink

/** The exactly-once contract of graft.sources.v2.CsvSink, including the
  * failure path: a job that dies mid-write must leave the PREVIOUS
  * committed generation — data files AND manifest — fully readable.
  */
class SinkV2Spec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_sinkv2_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeGen(path: String, keys: Seq[Long]): Unit =
    keys.toDF("key").select(col("key"), (col("key") * 10).as("n"))
      .repartition(2)
      .write.format("graft.sources.v2.CsvSink")
      .option("path", path).mode("overwrite").save()

  private def readCommitted(path: String): Map[Long, Long] =
    spark.read.schema("key LONG, n LONG").csv(CsvSink.committedFiles(path): _*)
      .as[(Long, Long)].collect().toMap

  test("commit publishes a manifest whose files exist and account for every row") {
    val path = freshDir("commit")
    writeGen(path, 1L to 20L)
    val files = CsvSink.committedFiles(path)
    assert(files.nonEmpty)
    files.foreach(f => assert(new File(f).exists(), s"manifest lists missing file $f"))
    assert(readCommitted(path) === (1L to 20L).map(k => k -> k * 10).toMap)
    // no temps or staged manifests survive a successful commit
    val leftovers = new File(path).listFiles()
      .map(_.getName).filter(n => n.startsWith("_tmp_") || n.startsWith("_MANIFEST.tmp."))
    assert(leftovers.isEmpty, s"leftover staging files: ${leftovers.mkString(",")}")
  }

  test("overwrite replaces the generation atomically and GCs the old files") {
    val path = freshDir("overwrite")
    writeGen(path, 1L to 10L)
    val gen1 = CsvSink.committedFiles(path).toSet
    writeGen(path, 100L to 104L)
    val gen2 = CsvSink.committedFiles(path).toSet
    assert(gen1.intersect(gen2).isEmpty, "generations must not share file names")
    assert(readCommitted(path) === (100L to 104L).map(k => k -> k * 10).toMap)
    // old generation GC'd after the new manifest became durable
    gen1.foreach(f => assert(!new File(f).exists(), s"stale old-generation file $f"))
  }

  test("a job that fails mid-write leaves the prior generation and MANIFEST intact") {
    val path = freshDir("abort")
    writeGen(path, 1L to 10L)
    val before = CsvSink.committedFiles(path)
    val manifestBytes = Files.readAllBytes(new File(path, "MANIFEST").toPath).toSeq

    // second write dies on a poisoned row AFTER some rows stream out;
    // local-mode maxFailures=1 fails the job → BatchWrite.abort()
    val poisoned = (50L to 60L).toDF("key")
      .select(col("key"),
        when(col("key") === 55L, expr("raise_error('poisoned row')").cast("long"))
          .otherwise(col("key") * 10).as("n"))
      .repartition(2)
    val ex = intercept[Exception] {
      poisoned.write.format("graft.sources.v2.CsvSink")
        .option("path", path).mode("overwrite").save()
    }
    assert(ex.toString.contains("poisoned") || ex.getCause != null)

    // prior generation: manifest byte-identical, every listed file alive,
    // data readable and unchanged
    assert(Files.readAllBytes(new File(path, "MANIFEST").toPath).toSeq === manifestBytes)
    assert(CsvSink.committedFiles(path) === before)
    before.foreach(f => assert(new File(f).exists(), s"prior-generation file $f destroyed"))
    assert(readCommitted(path) === (1L to 10L).map(k => k -> k * 10).toMap)

    // the failed job's staging fully cleaned: no temps, no staged
    // manifest, no staged parts beyond the committed set
    val names = new File(path).listFiles().map(_.getName).toSet
    assert(!names.exists(_.startsWith("_tmp_")), s"failed job left temps: $names")
    assert(!names.exists(_.startsWith("_MANIFEST.tmp.")), s"failed job left staged manifest: $names")
    val committedNames = before.map(f => new File(f).getName).toSet
    assert(names.filter(_.startsWith("part-")) === committedNames,
      s"failed job left staged parts: $names")

    // and the sink still works afterwards: a third, successful overwrite
    writeGen(path, 200L to 203L)
    assert(readCommitted(path) === (200L to 203L).map(k => k -> k * 10).toMap)
  }
}
