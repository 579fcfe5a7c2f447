package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** General-shape SQL MERGE over lake tables (LakeTable.mergeGeneral via
  * the extended LakeDmlRule): conditioned multi-arm WHEN MATCHED,
  * conditioned inserts, WHEN NOT MATCHED BY SOURCE, arbitrary ON —
  * the shapes the key-based fast path rejects. Copy-on-write stays
  * bounded to affected files; cardinality violations error.
  */
class LakeGeneralMergeSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_gm_$tag").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  private def kv(r: Range) = r.toDF("k")
    .select(col("k").cast("long").as("k"), (col("k") % 7).cast("long").as("v"))

  private def sqlTable(tag: String, name: String): LakeTable = {
    val t = LakeTable.create(spark, freshDir(tag),
      kv(1 to 400).repartitionByRange(4, col("k")), Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft.lake OPTIONS (path '${t.path}')")
    t
  }

  test("conditioned multi-arm WHEN MATCHED: first arm wins, others keep order") {
    sqlTable("arms", "gm_arms")
    kv(1 to 100).createOrReplaceTempView("gm_src")
    spark.sql(
      """MERGE INTO gm_arms t USING gm_src s ON t.k = s.k
        |WHEN MATCHED AND s.k % 10 = 0 THEN DELETE
        |WHEN MATCHED AND s.k % 2 = 0 THEN UPDATE SET v = t.v + 1000
        |WHEN MATCHED THEN UPDATE SET v = s.v + 100""".stripMargin)
    val rows = spark.table("gm_arms").as[(Long, Long)].collect().toMap
    assert(rows.size === 390) // 10 deleted (k=10..100 step 10)
    assert(!(10L to 100L by 10).exists(rows.contains))
    // evens (not %10) took arm 2: original v + 1000
    assert(rows(4L) === 4 % 7 + 1000)
    // odds took arm 3: source v + 100
    assert(rows(7L) === 7 % 7 + 100)
    // unmatched target rows untouched
    assert(rows(300L) === 300 % 7)
  }

  test("WHEN NOT MATCHED BY SOURCE arms update and delete leftovers") {
    sqlTable("nmbs", "gm_nmbs")
    kv(101 to 400).createOrReplaceTempView("gm_nmbs_src")
    spark.sql(
      """MERGE INTO gm_nmbs t USING gm_nmbs_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED BY SOURCE AND t.k <= 50 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""".stripMargin)
    val rows = spark.table("gm_nmbs").as[(Long, Long)].collect().toMap
    assert(rows.size === 350) // 1..50 deleted
    assert(!(1L to 50L).exists(rows.contains))
    assert((51L to 100L).forall(rows(_) === -1L)) // unmatched, not deleted
    assert(rows(200L) === 200 % 7)                // matched, updated to source v
  }

  test("conditioned INSERT arms: rows firing no arm are not inserted") {
    sqlTable("ins", "gm_ins")
    kv(395 to 420).createOrReplaceTempView("gm_ins_src")
    spark.sql(
      """MERGE INTO gm_ins t USING gm_ins_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED AND s.k <= 410 THEN INSERT (k, v) VALUES (s.k, s.v + 500)
        |WHEN NOT MATCHED AND s.k = 415 THEN INSERT (k, v) VALUES (s.k, 9999)""".stripMargin)
    val rows = spark.table("gm_ins").as[(Long, Long)].collect().toMap
    assert((401L to 410L).forall(k => rows(k) === k % 7 + 500))
    assert(rows(415L) === 9999L)
    assert(!rows.contains(411L) && !rows.contains(420L)) // no arm fired
    assert(rows.size === 400 + 10 + 1)
  }

  test("non-equi ON condition merges on a range predicate") {
    sqlTable("rng", "gm_rng")
    Seq((1L, 10L, 777L)).toDF("lo", "hi", "nv").createOrReplaceTempView("gm_rng_src")
    spark.sql(
      """MERGE INTO gm_rng t USING gm_rng_src s ON t.k >= s.lo AND t.k <= s.hi
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
    val rows = spark.table("gm_rng").as[(Long, Long)].collect().toMap
    assert((1L to 10L).forall(rows(_) === 777L))
    assert(rows(11L) === 11 % 7)
  }

  test("cardinality violation (one target row, two source matches) errors") {
    sqlTable("card", "gm_card")
    Seq((5L, 1L), (5L, 2L)).toDF("k", "v").createOrReplaceTempView("gm_card_src")
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO gm_card t USING gm_card_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msg.toLowerCase.contains("cardinality"), s"got: $msg")
    // table untouched
    assert(spark.table("gm_card").filter(col("k") === 5).as[(Long, Long)]
      .head()._2 === 5 % 7)
  }

  test("insert-only MERGE with a duplicate-matching source is legal (no spurious cardinality error)") {
    // SQL/Delta error only when the multi-matched row WOULD be updated
    // or deleted; with no WHEN MATCHED arm the duplicates are inert
    sqlTable("insonly", "gm_insonly")
    Seq((5L, 1L), (5L, 2L), (500L, 3L)).toDF("k", "v")
      .createOrReplaceTempView("gm_insonly_src")
    spark.sql(
      """MERGE INTO gm_insonly t USING gm_insonly_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val rows = spark.table("gm_insonly").as[(Long, Long)].collect()
    assert(rows.length === 401)  // raw length — toMap would mask dup keys
    assert(rows.filter(_._1 == 5L).toSeq === Seq((5L, 5 % 7)))  // untouched
    assert(rows.filter(_._1 == 500L).toSeq === Seq((500L, 3L))) // inserted
  }

  test("multi-match is legal when the matched conditions exclude the duplicates") {
    // two source rows match k=5 but only ONE passes the arm condition —
    // the outcome is deterministic, so no cardinality violation
    sqlTable("condcard", "gm_condcard")
    Seq((5L, 10L), (5L, 11L)).toDF("k", "v")
      .createOrReplaceTempView("gm_condcard_src")
    spark.sql(
      """MERGE INTO gm_condcard t USING gm_condcard_src s ON t.k = s.k
        |WHEN MATCHED AND s.v = 10 THEN UPDATE SET v = s.v""".stripMargin)
    // raw row count (NOT a toMap, which would mask duplicate keys) and
    // the exact multiset at the multi-matched key
    val rows = spark.table("gm_condcard").as[(Long, Long)].collect()
    assert(rows.length === 400)
    assert(rows.filter(_._1 == 5L).toSeq === Seq((5L, 10L)))
  }

  test("multi-match with NO firing arm leaves one copy when its file is rewritten") {
    // k=5 matches twice but neither copy passes the arm condition; k=6
    // (same range file) fires an update, so the file IS rewritten —
    // the rewrite must emit the inert multi-matched row exactly once
    sqlTable("inertdup", "gm_inertdup")
    Seq((5L, 100L), (5L, 101L), (6L, 60L)).toDF("k", "v")
      .createOrReplaceTempView("gm_inertdup_src")
    spark.sql(
      """MERGE INTO gm_inertdup t USING gm_inertdup_src s ON t.k = s.k
        |WHEN MATCHED AND s.v = 60 THEN UPDATE SET v = s.v""".stripMargin)
    val rows = spark.table("gm_inertdup").as[(Long, Long)].collect()
    assert(rows.length === 400)
    assert(rows.filter(_._1 == 5L).toSeq === Seq((5L, 5 % 7)))  // untouched, once
    assert(rows.filter(_._1 == 6L).toSeq === Seq((6L, 60L)))    // updated
  }

  test("multi-match DELETE via the single firing copy removes the row exactly") {
    sqlTable("deldup", "gm_deldup")
    Seq((5L, 10L), (5L, 11L)).toDF("k", "v")
      .createOrReplaceTempView("gm_deldup_src")
    spark.sql(
      """MERGE INTO gm_deldup t USING gm_deldup_src s ON t.k = s.k
        |WHEN MATCHED AND s.v = 10 THEN DELETE""".stripMargin)
    val rows = spark.table("gm_deldup").as[(Long, Long)].collect()
    assert(rows.length === 399)
    assert(!rows.exists(_._1 == 5L))
  }

  test("copy-on-write stays bounded: untouched range-files carry by reference") {
    val t = sqlTable("cow", "gm_cow")
    val before = t.fileNames(t.currentVersion).toSet
    kv(1 to 50).createOrReplaceTempView("gm_cow_src")
    spark.sql(
      """MERGE INTO gm_cow t USING gm_cow_src s ON t.k = s.k
        |WHEN MATCHED AND s.k % 2 = 0 THEN UPDATE SET v = 0""".stripMargin)
    val after = t.fileNames(t.currentVersion).toSet
    // k = 1..50 lives in file 1 of 4 range files; the other 3 carry over
    assert((before intersect after).size === 3,
      s"expected 3 carried files, before=$before after=$after")
    assert(spark.table("gm_cow").count() === 400)
  }

  test("the key-equality fast path still takes the specialized command") {
    val t = sqlTable("fast", "gm_fast")
    kv(1 to 10).createOrReplaceTempView("gm_fast_src")
    spark.sql(
      """MERGE INTO gm_fast t USING gm_fast_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    assert(spark.table("gm_fast").count() === 400)
    assert(t.history().last.operation === "merge")
  }
}
