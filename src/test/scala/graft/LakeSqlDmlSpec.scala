package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** SQL DML over lake tables (graft.lake.LakeDmlRule via
  * GraftExtensions): DELETE FROM / UPDATE / MERGE INTO statements on a
  * `CREATE TABLE ... USING graft.lake` table run the corresponding
  * file-pruned copy-on-write mutations, refresh the cached relation,
  * and reject unsupported MERGE shapes with a clear error.
  */
class LakeSqlDmlSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_dml_$tag").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  private def kv(r: Range) = r.toDF("k")
    .select(col("k").cast("long").as("k"), (col("k") % 7).cast("long").as("v"))

  /** 4 range-clustered files over k = 1..400, registered as `name`. */
  private def sqlTable(tag: String, name: String): LakeTable = {
    val path = freshDir(tag)
    val t = LakeTable.create(spark, path,
      kv(1 to 400).repartitionByRange(4, col("k")), Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft.lake OPTIONS (path '${t.path}')")
    t
  }

  test("DELETE FROM prunes files and refreshes the cached relation") {
    val t = sqlTable("del", "dml_del")
    try {
      val before = t.fileNames(t.currentVersion).toSet
      spark.sql("DELETE FROM dml_del WHERE k <= 100")
      // copy-on-write bounded by the stats-pruned probe: the predicate
      // sits in file 1, the other three carry over by reference
      val after = t.fileNames(t.currentVersion).toSet
      assert((before intersect after).size == 3)
      // the post-DML SELECT sees the new snapshot (cache refreshed)
      assert(spark.sql("SELECT count(*) FROM dml_del").head().getLong(0) == 300)
      assert(t.history().last.operation == "delete")
    } finally spark.sql("DROP TABLE IF EXISTS dml_del")
  }

  test("UPDATE SET ... WHERE rewrites only the touched files") {
    val t = sqlTable("upd", "dml_upd")
    try {
      val before = t.fileNames(t.currentVersion).toSet
      spark.sql("UPDATE dml_upd SET v = v + 100 WHERE k BETWEEN 150 AND 160")
      val after = t.fileNames(t.currentVersion).toSet
      assert((before intersect after).size == 3)
      val got = spark.sql("SELECT v FROM dml_upd WHERE k = 155").head().getLong(0)
      assert(got == 155 % 7 + 100)
      assert(spark.sql("SELECT count(*) FROM dml_upd WHERE v >= 100")
        .head().getLong(0) == 11)
      assert(t.history().last.operation == "update")
    } finally spark.sql("DROP TABLE IF EXISTS dml_upd")
  }

  test("MERGE INTO: update, matched delete, insert, unmatched-delete inserts") {
    val t = sqlTable("mrg", "dml_mrg")
    try {
      kv(395 to 410).select(col("k"), lit(-1L).as("v"))
        .createOrReplaceTempView("dml_src")
      spark.sql("""MERGE INTO dml_mrg t USING dml_src s ON t.k = s.k
        WHEN MATCHED AND s.k % 2 = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      // matched 395..400: even deleted (3), odd updated (3);
      // unmatched 401..410 all inserted — including the even ones the
      // delete arm does NOT capture (SQL scopes it to matched rows)
      assert(spark.sql("SELECT count(*) FROM dml_mrg").head().getLong(0) == 407)
      assert(spark.sql("SELECT count(*) FROM dml_mrg WHERE v = -1")
        .head().getLong(0) == 13)
      assert(spark.sql("SELECT count(*) FROM dml_mrg WHERE k IN (396, 398, 400)")
        .head().getLong(0) == 0)
      assert(t.history().last.operation == "merge")
    } finally spark.sql("DROP TABLE IF EXISTS dml_mrg")
  }

  test("MERGE with an unconditional delete arm deletes every matched row") {
    sqlTable("mrgdel", "dml_mrgdel")
    try {
      kv(395 to 410).select(col("k"), lit(-1L).as("v"))
        .createOrReplaceTempView("dml_del_src")
      spark.sql("""MERGE INTO dml_mrgdel t USING dml_del_src s ON t.k = s.k
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      // matched 395..400 deleted; unmatched 401..410 inserted
      assert(spark.sql("SELECT count(*) FROM dml_mrgdel")
        .head().getLong(0) == 404)
      assert(spark.sql(
        "SELECT count(*) FROM dml_mrgdel WHERE k BETWEEN 395 AND 400")
        .head().getLong(0) == 0)
      // delete-only WITH a condition now routes to the GENERAL merge
      // (the key-based fast path could not express it): the source's
      // v = -1 fires the delete on every matched row (401..410), while
      // the unmatched 395..400 go through the INSERT arm
      spark.sql("""MERGE INTO dml_mrgdel t USING dml_del_src s ON t.k = s.k
        WHEN MATCHED AND s.v < 0 THEN DELETE
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      assert(spark.sql("SELECT count(*) FROM dml_mrgdel")
        .head().getLong(0) == 400)
      assert(spark.sql(
        "SELECT count(*) FROM dml_mrgdel WHERE k BETWEEN 401 AND 410")
        .head().getLong(0) == 0)
      assert(spark.sql(
        "SELECT count(*) FROM dml_mrgdel WHERE k BETWEEN 395 AND 400 AND v = -1")
        .head().getLong(0) == 6)
      // a matched row whose condition does NOT fire stays untouched:
      // re-merge with a condition no source row meets
      spark.sql("""MERGE INTO dml_mrgdel t USING dml_del_src s ON t.k = s.k
        WHEN MATCHED AND s.v > 0 THEN DELETE
        WHEN NOT MATCHED AND s.v > 0 THEN INSERT (k, v) VALUES (s.k, s.v)""")
      assert(spark.sql("SELECT count(*) FROM dml_mrgdel")
        .head().getLong(0) == 400)
    } finally spark.sql("DROP TABLE IF EXISTS dml_mrgdel")
  }

  test("formerly-unsupported MERGE shapes run on the general path") {
    sqlTable("bad", "dml_bad")
    try {
      kv(1 to 5).createOrReplaceTempView("dml_bad_src")
      // conditioned UPDATE arm (the old rule rejected it): only s.v > 3
      spark.sql("""MERGE INTO dml_bad t USING dml_bad_src s ON t.k = s.k
        WHEN MATCHED AND s.v > 3 THEN UPDATE SET v = s.v + 100
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
      // k=4 (v=4) and k=5 (v=5) fire; k=1..3 (v<=3) stay untouched
      assert(spark.sql("SELECT v FROM dml_bad WHERE k = 4").head().getLong(0) == 104)
      assert(spark.sql("SELECT v FROM dml_bad WHERE k = 3").head().getLong(0) == 3)
      // non-equi ON with multi-matching rows hits the SQL cardinality
      // rule (clear error, not a silent row duplication)
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO dml_bad t USING dml_bad_src s ON t.k > s.k
          WHEN MATCHED THEN UPDATE SET v = s.v""")
      }
      val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).filter(_ != null).mkString(" | ")
      assert(msg.toLowerCase.contains("cardinality"), s"got: $msg")
    } finally spark.sql("DROP TABLE IF EXISTS dml_bad")
  }

  test("DML works on a DV-carrying table (DvMaskedRelation target)") {
    val t = sqlTable("dv", "dml_dv")
    try {
      t.deleteWhereMoR(col("k") % 10 === 0) // table now carries a DV
      spark.sql("REFRESH TABLE dml_dv")
      spark.sql("DELETE FROM dml_dv WHERE k <= 50")
      // 400 - 40 (MoR) - 45 (k<=50 minus the 5 already-masked tens)
      assert(spark.sql("SELECT count(*) FROM dml_dv").head().getLong(0) == 315)
    } finally spark.sql("DROP TABLE IF EXISTS dml_dv")
  }

  test("SQL time travel: VERSION AS OF reads retained snapshots") {
    val t = sqlTable("tt", "dml_tt")
    try {
      spark.sql("DELETE FROM dml_tt WHERE k <= 100")
      assert(spark.sql("SELECT count(*) FROM dml_tt").head().getLong(0) == 300)
      assert(spark.sql("SELECT count(*) FROM dml_tt VERSION AS OF 1")
        .head().getLong(0) == 400)
      // the versioned scan is an ordinary plan: aggregates compose
      val s1 = spark.sql(
        "SELECT sum(k) FROM dml_tt VERSION AS OF 1 WHERE k <= 100")
        .head().getLong(0)
      assert(s1 == (1L to 100L).sum)
      // an unretained version errors clearly
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM dml_tt VERSION AS OF 99").collect()
      }
      assert(e.getMessage.contains("not retained") ||
        e.getMessage.contains("99"))
      assert(t.currentVersion == 2)
    } finally spark.sql("DROP TABLE IF EXISTS dml_tt")
  }

  test("VERSION AS OF on non-lake tables keeps the standard error") {
    val dir = freshDir("ttplain")
    kv(1 to 10).write.parquet(dir)
    spark.sql(s"CREATE TABLE dml_ttplain USING parquet OPTIONS (path '$dir')")
    try {
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM dml_ttplain VERSION AS OF 1").collect()
      }
      assert(e.getMessage.contains("TIME_TRAVEL") ||
        e.getMessage.toLowerCase.contains("time travel"))
    } finally spark.sql("DROP TABLE IF EXISTS dml_ttplain")
  }

  test("DML on non-lake tables is left alone (plain parquet still errors)") {
    val dir = freshDir("plain")
    kv(1 to 10).write.parquet(dir)
    spark.sql(s"CREATE TABLE dml_plain USING parquet OPTIONS (path '$dir')")
    try {
      val e = intercept[Exception] {
        spark.sql("DELETE FROM dml_plain WHERE k = 1")
      }
      assert(e.getMessage.contains("does not support DELETE"))
    } finally spark.sql("DROP TABLE IF EXISTS dml_plain")
  }
}
