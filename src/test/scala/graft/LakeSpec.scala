package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{ConcurrentCommitException, LakeTable}

/** The ACID contract of graft.lake.LakeTable: versioned snapshots,
  * atomic exclusive commits, copy-on-write with file-level pruning,
  * time travel, and vacuum.
  */
class LakeSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_lake_$tag").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  private def df(keys: Seq[Int], tag: String) =
    keys.toDF("k").select(col("k").cast("long").as("k"),
      concat(lit(tag), lit(":"), col("k")).as("v"))

  private def contents(t: LakeTable): Map[Long, String] =
    t.read().as[(Long, String)].collect().toMap

  test("create/read roundtrip; readers never see unreferenced files") {
    val path = freshDir("rt")
    val t = LakeTable.create(spark, path, df(1 to 100, "a").repartition(4), Seq("k"))
    assert(t.currentVersion == 1)
    assert(contents(t) == (1 to 100).map(k => k.toLong -> s"a:$k").toMap)
    // an orphan parquet dropped into the directory is invisible
    df(900 to 910, "junk").coalesce(1).write.parquet(s"$path/_staging_junk")
    val junk = new File(s"$path/_staging_junk").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(junk.toPath, Paths.get(path, "part-junk-00000.parquet"))
    assert(contents(LakeTable.forPath(spark, path)) ==
      (1 to 100).map(k => k.toLong -> s"a:$k").toMap)
  }

  test("append and overwrite version the table; history records them") {
    val path = freshDir("ao")
    val t = LakeTable.create(spark, path, df(1 to 10, "a"), Seq("k"))
    assert(t.append(df(11 to 20, "b")) == 2)
    assert(contents(t).size == 20)
    assert(t.overwrite(df(50 to 54, "c")) == 3)
    assert(contents(t) == (50 to 54).map(k => k.toLong -> s"c:$k").toMap)
    assert(t.history().map(h => (h.version, h.operation, h.totalRows)) ==
      Seq((1, "create", 10L), (2, "append", 20L), (3, "overwrite", 5L)))
  }

  test("merge upserts by key and carries non-overlapping files by reference") {
    val path = freshDir("merge")
    // two disjoint key ranges land in separate files (separate commits)
    val t = LakeTable.create(spark, path, df(1 to 100, "lo").coalesce(1), Seq("k"))
    t.append(df(1001 to 1100, "hi").coalesce(1))
    val filesBefore = t.read().select(input_file_name()).distinct()
      .as[String].collect().map(p => new File(p).getName).toSet
    assert(filesBefore.size >= 2)

    // updates touch only the low range: 3 replaced + 2 inserted
    val v3 = t.merge(df(Seq(5, 50, 100, 200, 201), "upd"), "k")
    assert(v3 == 3)
    val got = contents(t)
    assert(got(5L) == "upd:5" && got(50L) == "upd:50" && got(100L) == "upd:100")
    assert(got(200L) == "upd:200" && got(201L) == "upd:201")
    assert(got(1L) == "lo:1" && got(1001L) == "hi:1001")
    assert(got.size == 100 + 100 + 2)

    // the hi-range file must survive UNREWRITTEN (same physical file)
    val filesAfter = t.read().select(input_file_name()).distinct()
      .as[String].collect().map(p => new File(p).getName).toSet
    val hiFiles = spark.read.parquet(filesBefore.map(n => s"$path/$n").toSeq: _*)
      .filter(col("k") >= 1000).select(input_file_name()).distinct()
      .as[String].collect().map(p => new File(p).getName).toSet
    assert(hiFiles.subsetOf(filesAfter),
      s"non-overlapping files were rewritten: before=$hiFiles after=$filesAfter")
  }

  test("pruned read skips files outside the stats range") {
    val path = freshDir("prune")
    val t = LakeTable.create(spark, path, df(1 to 100, "lo").coalesce(1), Seq("k"))
    t.append(df(1001 to 1100, "hi").coalesce(1))
    val pruned = t.prunedRead("k", 1050, 1060)
    val prunedFiles = pruned.select(input_file_name()).distinct().count()
    assert(prunedFiles == 1, "stats pruning should read exactly the hi file")
    assert(pruned.filter(col("k").between(1050, 1060)).count() == 11)
  }

  test("deleteWhere rewrites only files containing matches") {
    val path = freshDir("del")
    val t = LakeTable.create(spark, path, df(1 to 100, "lo").coalesce(1), Seq("k"))
    t.append(df(1001 to 1100, "hi").coalesce(1))
    val hiFilesBefore = t.read().filter(col("k") >= 1000)
      .select(input_file_name()).distinct().as[String].collect()
      .map(p => new File(p).getName).toSet
    val v3 = t.deleteWhere(col("k") <= 10)
    assert(v3 == 3)
    assert(contents(t).size == 200 - 10)
    assert(!contents(t).contains(5L) && contents(t).contains(11L))
    val after = t.read().select(input_file_name()).distinct()
      .as[String].collect().map(p => new File(p).getName).toSet
    assert(hiFilesBefore.subsetOf(after), "untouched file was rewritten by delete")
    // deleting nothing is a no-op version-wise
    assert(t.deleteWhere(col("k") === 99999L) == 3)
  }

  test("time travel reads any retained snapshot") {
    val path = freshDir("tt")
    val t = LakeTable.create(spark, path, df(1 to 5, "v1"))
    t.overwrite(df(1 to 5, "v2"))
    t.merge(df(Seq(3), "v3").select(col("k"), col("v")), "k")
    assert(t.readVersion(1).as[(Long, String)].collect().toMap.apply(3L) == "v1:3")
    assert(t.readVersion(2).as[(Long, String)].collect().toMap.apply(3L) == "v2:3")
    assert(contents(t)(3L) == "v3:3" && contents(t)(2L) == "v2:2")
  }

  test("vacuum drops unreferenced files and old manifests, keeps retained reads") {
    val path = freshDir("vac")
    val t = LakeTable.create(spark, path, df(1 to 50, "v1").repartition(2), Seq("k"))
    t.overwrite(df(1 to 50, "v2").repartition(2))
    t.overwrite(df(1 to 50, "v3").repartition(2))
    val deleted = t.vacuum(retainVersions = 2)
    assert(deleted.nonEmpty, "v1's files should be collected")
    // retained versions still read fine
    assert(t.readVersion(2).count() == 50 && t.readVersion(3).count() == 50)
    // vacuumed version is now an explicit error, not silent corruption
    val e = intercept[IllegalArgumentException] { t.readVersion(1) }
    assert(e.getMessage.contains("not retained"))
    // every surviving parquet is referenced by a retained manifest
    val onDisk = new File(path).list((_, n) => n.endsWith(".parquet")).toSet
    val referenced = (2 to 3).flatMap(v =>
      t.readVersion(v).select(input_file_name()).distinct()
        .as[String].collect().map(p => new File(p).getName)).toSet
    assert(onDisk == referenced)
  }

  test("commits are atomic and exclusive: one winner per version") {
    val path = freshDir("race")
    val t = LakeTable.create(spark, path, df(1 to 10, "a"))
    // simulate a racing writer that publishes v2 between our read and commit
    val racer = LakeTable.forPath(spark, path)
    racer.append(df(11 to 20, "racer"))
    // a manual commit at the now-taken version must fail atomically
    intercept[ConcurrentCommitException] {
      graft.lake.LakeTestAccess.recommitAt(t, 2, 1)
    }
    // the racer's commit is intact
    assert(contents(t).size == 20)
    // append auto-retries past lost races (here: plain next-version append)
    assert(t.append(df(21 to 25, "b")) == 3)
    assert(contents(t).size == 25)
    // no stray temp manifests
    assert(new File(s"$path/_graft_log").list((_, n) => n.startsWith(".tmp_")).isEmpty)
  }

  test("a crash before manifest publish leaves the snapshot untouched") {
    val path = freshDir("crash")
    val t = LakeTable.create(spark, path, df(1 to 10, "a"))
    val before = contents(t)
    // simulate a writer that staged data files but died before commit:
    // drop job-unique parquet files into the table root with no manifest
    df(100 to 120, "ghost").coalesce(1).write.parquet(s"$path/_staging_ghost")
    val part = new File(s"$path/_staging_ghost").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(path, "part-deadbeef0000-00000.parquet"))
    assert(contents(LakeTable.forPath(spark, path)) == before)
    // a FRESH unreferenced file is indistinguishable from a concurrent
    // writer's staged-not-yet-committed output — vacuum must leave it
    val spared = t.vacuum(retainVersions = 1)
    assert(!spared.contains("part-deadbeef0000-00000.parquet"))
    assert(Files.exists(Paths.get(path, "part-deadbeef0000-00000.parquet")))
    // once older than the orphan grace window it is a true crash orphan
    // and vacuum collects it
    new File(path, "part-deadbeef0000-00000.parquet")
      .setLastModified(System.currentTimeMillis() - LakeTable.OrphanGraceMs - 1000)
    val deleted = t.vacuum(retainVersions = 1)
    assert(deleted.contains("part-deadbeef0000-00000.parquet"))
    assert(contents(t) == before)
  }

  test("compact bin-packs small files content-identically, big files carry over") {
    val path = freshDir("compact")
    val t = LakeTable.create(spark, path, df(1 to 1000, "big").coalesce(1), Seq("k"))
    (1 to 3).foreach(r => t.append(df((2000 + 10 * r) to (2005 + 10 * r), "s").coalesce(1)))
    val before = contents(t)
    val bigFile = t.read().filter(col("k") <= 1000)
      .select(input_file_name()).distinct().as[String].collect()
      .map(p => new File(p).getName).toSet
    // files under 100 rows are small: the three 6-row appends compact to one
    val v = t.compact(smallFileRows = 100, targetRows = 1000)
    assert(v == 5)
    assert(contents(t) == before, "compaction must not change content")
    val after = t.read().select(input_file_name()).distinct()
      .as[String].collect().map(p => new File(p).getName).toSet
    assert(bigFile.subsetOf(after), "big file must carry over unrewritten")
    assert(after.size == bigFile.size + 1, s"3 small files should become 1: $after")
    // second compact is a no-op (only one small file left)
    assert(t.compact(smallFileRows = 100, targetRows = 1000) == 5)
  }

  test("appendEvolve adds columns with null backfill; old versions keep their schema") {
    val path = freshDir("evolve")
    val t = LakeTable.create(spark, path, df(1 to 10, "a"), Seq("k"))
    // new batch arrives with an extra column
    val withExtra = df(11 to 20, "b").withColumn("score", col("k") * lit(2.0))
    assert(t.appendEvolve(withExtra) == 2)
    assert(t.read().schema.fieldNames.toSeq == Seq("k", "v", "score"))
    val scores = t.read().select(col("k"), col("score"))
      .as[(Long, Option[Double])].collect().toMap
    assert((1 to 10).forall(k => scores(k.toLong).isEmpty), "old files null-backfill")
    assert((11 to 20).forall(k => scores(k.toLong).contains(k * 2.0)))
    // time travel: v1 still reads the ORIGINAL 2-column shape
    assert(t.readVersion(1).schema.fieldNames.toSeq == Seq("k", "v"))
    // a batch may also OMIT an existing column (staged as NULL)
    val missingV = (21 to 25).toDF("k").select(col("k").cast("long").as("k"),
      (col("k") * lit(3.0)).as("score"))
    assert(t.appendEvolve(missingV) == 3)
    val vs = t.read().select(col("k"), col("v")).as[(Long, Option[String])].collect().toMap
    assert((21 to 25).forall(k => vs(k.toLong).isEmpty))
    assert(vs(5L).contains("a:5"))
    // type evolution is rejected
    val wrongType = (30 to 31).toDF("k").select(col("k").cast("int").as("k"))
    intercept[IllegalArgumentException] { t.appendEvolve(wrongType) }
  }

  test("readAppendsSince returns exactly the rows of files added after a version") {
    val path = freshDir("incr")
    val t = LakeTable.create(spark, path, df(1 to 10, "a").coalesce(1), Seq("k"))
    t.append(df(11 to 20, "b").coalesce(1))
    t.append(df(21 to 30, "c").coalesce(1))
    val tail = t.readAppendsSince(1).as[(Long, String)].collect().toMap
    assert(tail.keySet == (11 to 30).map(_.toLong).toSet)
    assert(tail(15L) == "b:15" && tail(25L) == "c:25")
    // since the current version: empty, with the table's schema
    val empty = t.readAppendsSince(3)
    assert(empty.count() == 0 && empty.schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("changesBetween tags merge deltas and scans only non-shared files") {
    val path = freshDir("cdf")
    val t = LakeTable.create(spark, path, df(1 to 100, "lo").coalesce(1), Seq("k"))
    t.append(df(1001 to 1100, "hi").coalesce(1))
    t.merge(df(Seq(5, 50, 200), "upd"), "k") // 2 updates + 1 insert, lo range only
    val changes = t.changesBetween(2, 3)
      .as[(Long, String, String)].collect().toSet
    assert(changes == Set(
      (5L, "upd:5", "insert"), (50L, "upd:50", "insert"), (200L, "upd:200", "insert"),
      (5L, "lo:5", "delete"), (50L, "lo:50", "delete")),
      s"unexpected change set: $changes")
    // physical guarantee: the shared (hi) file is excluded from the
    // diff's plan inputs — only the rewritten lo-generation files feed it
    val hiFile = t.read().filter(col("k") >= 1000)
      .select(input_file_name()).distinct().as[String].collect()
      .map(p => new File(p).getName).toSet
    assert(hiFile.nonEmpty)
    val diffInputs = t.changesBetween(2, 3).inputFiles
      .map(p => new File(p).getName).toSet
    assert((diffInputs & hiFile).isEmpty,
      s"shared file must not feed the diff: $diffInputs")
    // identical versions diff to nothing
    assert(t.changesBetween(3, 3).count() == 0)
    // schema change between versions is an explicit error
    val t2 = LakeTable.create(spark, freshDir("cdf2") + "/t", df(1 to 3, "x"))
    t2.overwrite((1 to 3).toDF("k").select(col("k").cast("long").as("k")))
    intercept[IllegalArgumentException] { t2.changesBetween(1, 2) }
  }

  test("clustered compact range-partitions files so stats pruning bites") {
    val path = freshDir("cluster")
    // hash layout: every file spans the whole key range → nothing prunes
    val t = LakeTable.create(spark, path, df(1 to 1000, "a").repartition(4), Seq("k"))
    val before = t.prunedRead("k", 100, 150).select(input_file_name()).distinct().count()
    assert(before == 4, "hash layout should defeat stats pruning")
    val content = contents(t)
    assert(t.compact(Long.MaxValue, 251, Seq("k")) == 2)
    assert(contents(t) == content, "clustered compact must not change content")
    val after = t.prunedRead("k", 100, 150).select(input_file_name()).distinct().count()
    assert(after < before, s"clustered layout should prune ($after vs $before)")
    assert(t.history().last.operation == "compact-clustered")
  }

  test("schema drift on append/merge is rejected; overwrite may change schema") {
    val path = freshDir("schema")
    val t = LakeTable.create(spark, path, df(1 to 5, "a"))
    val wrong = (1 to 5).toDF("k").select(col("k").cast("int").as("k"),
      lit(1.0).as("other"))
    intercept[IllegalArgumentException] { t.append(wrong) }
    intercept[IllegalArgumentException] { t.merge(wrong, "k") }
    assert(t.overwrite(wrong) == 2)
    assert(t.read().schema.fieldNames.toSeq == Seq("k", "other"))
  }
}
