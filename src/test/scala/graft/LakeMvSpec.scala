package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{LakeMv, LakeTable}

/** Incremental materialized view (graft.lake.LakeMv): refreshes fold
  * only the change feed, results match a full recompute exactly, and
  * the progress anchor is atomic with the refreshed rows.
  */
class LakeMvSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_mv_$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  private def kv(r: Range, seg: Long => String = k => s"g${k % 3}") =
    r.map(k => (k.toLong, seg(k.toLong), k * 1.5)).toDF("k", "g", "price")

  private def recompute(t: LakeTable) = t.read().groupBy("g")
    .agg(count(lit(1)).as("cnt"),
      sum(col("price").cast("decimal(18,2)")).cast("decimal(28,2)").as("total"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDecimal(2).toPlainString))).toMap

  test("refresh after append equals full recompute and scans only the delta") {
    val t = LakeTable.create(spark, freshDir("app"), kv(1 to 3000).coalesce(2), Seq("k"))
    val mv = LakeMv.create(spark, freshDir("app_mv"), t, Seq("g"), "price")
    assert(asMap(mv.read()) === asMap(recompute(t)))
    t.append(kv(3001 to 3100).coalesce(1))
    val scanned = mv.refresh()
    assert(scanned === 100L, s"append of 100 rows must scan 100 feed rows, got $scanned")
    assert(asMap(mv.read()) === asMap(recompute(t)))
  }

  test("refresh after CoW delete and MoR delete stays exact") {
    val t = LakeTable.create(spark, freshDir("del"), kv(1 to 2000).coalesce(2), Seq("k"))
    val mv = LakeMv.create(spark, freshDir("del_mv"), t, Seq("g"), "price")
    t.deleteWhere(col("k") <= 100)
    mv.refresh()
    assert(asMap(mv.read()) === asMap(recompute(t)))
    t.deleteWhereMoR(col("k") % 7 === 0)
    mv.refresh()
    assert(asMap(mv.read()) === asMap(recompute(t)))
  }

  test("groups appear and disappear through refreshes") {
    val t = LakeTable.create(spark, freshDir("grp"), kv(1 to 300).coalesce(1), Seq("k"))
    val mv = LakeMv.create(spark, freshDir("grp_mv"), t, Seq("g"), "price")
    // a brand-new group arrives
    t.append(Seq((9001L, "brandnew", 10.0)).toDF("k", "g", "price").coalesce(1))
    mv.refresh()
    assert(asMap(mv.read()).contains("brandnew"))
    // ...and is deleted entirely: the row must leave the view
    t.deleteWhere(col("g") === "brandnew")
    mv.refresh()
    assert(!asMap(mv.read()).contains("brandnew"))
    assert(asMap(mv.read()) === asMap(recompute(t)))
  }

  test("refresh is idempotent at head and the anchor tracks the base version") {
    val t = LakeTable.create(spark, freshDir("idem"), kv(1 to 500).coalesce(1), Seq("k"))
    val mv = LakeMv.create(spark, freshDir("idem_mv"), t, Seq("g"), "price")
    assert(mv.baseVersion === 1)
    assert(mv.refresh() === 0L)
    t.append(kv(501 to 600).coalesce(1))
    assert(mv.refresh() > 0L)
    assert(mv.baseVersion === t.currentVersion)
    assert(mv.refresh() === 0L, "a replayed refresh must no-op")
  }

  test("forPath reopens the view with its anchor intact") {
    val t = LakeTable.create(spark, freshDir("open"), kv(1 to 400).coalesce(1), Seq("k"))
    val mvPath = freshDir("open_mv")
    LakeMv.create(spark, mvPath, t, Seq("g"), "price")
    t.append(kv(401 to 450).coalesce(1))
    val mv2 = LakeMv.forPath(spark, mvPath, t, Seq("g"), "price")
    mv2.refresh()
    assert(asMap(mv2.read()) === asMap(recompute(t)))
  }

  test("statsReport folds exact nulls, bounds, and a sane ndv from the manifest") {
    val df = spark.range(0, 1000)
      .select(col("id").as("k"),
        when(col("id") % 4 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), col("id") % 40)).as("s"))
    val t = LakeTable.create(spark, freshDir("rep"), df.coalesce(2), Seq("k", "s"))
    val rep = t.statsReport().collect().map(r => r.getString(0) -> r).toMap
    val k = rep("k")
    assert(k.getLong(1) === 1000L)               // row_count
    assert(k.getLong(2) === 0L)                  // null_count
    assert(k.getLong(4) === 0L && k.getLong(5) === 999L) // min/max
    val kNdv = k.getLong(3)
    assert(kNdv >= 850 && kNdv <= 1150, s"ndv_est for 1000 distinct: $kNdv")
    val s = rep("s")
    assert(s.getLong(2) === 250L)
    assert(s.isNullAt(4) && s.isNullAt(5), "string columns carry no long bounds")
    // true ndv is 30: nulls hit id%4==0, which removes exactly the 10
    // residues of id%40 that are ≡0 (mod 4)
    val sNdv = s.getLong(3)
    assert(sNdv >= 25 && sNdv <= 35, s"ndv_est for 30 distinct strings: $sNdv")
    // DV-masked rows leave row_count logical
    t.deleteWhereMoR(col("k") < 100)
    assert(t.statsReport().head().getLong(1) === 900L)
  }
}
