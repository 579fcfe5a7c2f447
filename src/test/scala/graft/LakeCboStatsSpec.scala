package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeTable

/** Manifest statistics → CBO (graft.lake.LakeCboStatsRule): a
  * session-catalog lake table exposes exact rowCount and per-column
  * bounds to the optimizer, so a range-filtered fact broadcasts
  * UNHINTED where the size-only estimate would sort-merge.
  */
class LakeCboStatsSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_cbo_$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getAbsolutePath
  }

  private def wide(n: Int) = spark.range(1, n + 1)
    .select(col("id").as("k"),
      concat(lit("payload_"), col("id")).as("v"))

  private def sqlLake(tag: String, name: String, n: Int): LakeTable = {
    val t = LakeTable.create(spark, freshDir(tag), wide(n), Seq("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft.lake OPTIONS (path '${t.path}')")
    t
  }

  test("statsOf folds the manifest exactly: rowCount (DV-aware) and k bounds") {
    val t = LakeTable.create(spark, freshDir("fold"), wide(1000), Seq("k"))
    t.deleteWhereMoR(col("k") <= 100) // masks 100 rows without rewriting files
    val m = graft.lake.LakeCboStatsRule.statsOfForTest(spark, t)
    assert(m.rowCount.contains(BigInt(900)))
    val k = m.colStats("k")
    assert(k.min.contains("1") && k.max.contains("1000"))
    assert(k.distinctCount.exists(_ <= BigInt(1000)))
  }

  test("HLL ndv and real null counts reach the CBO column stats") {
    val df = spark.range(0, 1000)
      .select((col("id") % 100).as("k"),
        when(col("id") % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), col("id") % 50)).as("v"))
    val t = LakeTable.create(spark, freshDir("hll"), df, Seq("k", "v"))
    val m = graft.lake.LakeCboStatsRule.statsOfForTest(spark, t)
    val k = m.colStats("k")
    // the sketch estimate for 100 true distincts must land near 100 —
    // NOT the range upper bound (0..99 → 100 happens to coincide, so
    // also pin the string column where range fallback was rowCount)
    assert(k.distinctCount.exists(d => d >= BigInt(90) && d <= BigInt(110)))
    assert(k.nullCount.contains(BigInt(0)))
    // true string ndv is 45: the nulled ids (≡0 mod 10) are exactly the
    // ones whose id%50 residue is in {0,10,20,30,40}, removing 5 of the
    // 50 residues. lgK=8 HLL stddev ≈6.5% → accept ±20%.
    val v = m.colStats("v")
    assert(v.distinctCount.exists(d => d >= BigInt(36) && d <= BigInt(54)),
      s"string ndv should come from the HLL sketch (~45), got ${v.distinctCount}")
    assert(v.nullCount.contains(BigInt(100)))
    assert(v.min.isEmpty && v.max.isEmpty)
  }

  test("range-filtered lake fact broadcasts unhinted under CBO with manifest stats") {
    sqlLake("fact_a", "cbo_a", 200000)
    sqlLake("fact_b", "cbo_b", 200000)
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldCbo = conf.get("spark.sql.cbo.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", (1024 * 1024).toString)
      conf.set("spark.sql.cbo.enabled", "true")
      // narrow range filter on the stats column: FilterEstimation
      // interpolates against the manifest [1, 200000] bounds → ~500-row
      // estimate → broadcast, no hint anywhere
      val q = spark.table("cbo_a").filter(col("k") <= 500)
        .join(spark.table("cbo_b"), "k")
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"filtered fact should broadcast from manifest column stats:\n$p")
      // control: the same-shaped filter on a column WITHOUT manifest
      // stats cannot shrink the estimate — both sides stay fact-sized
      // and the join must sort-merge
      val c = spark.table("cbo_a").filter(col("v") < "payload_2")
        .join(spark.table("cbo_b"), "k")
      val pc = c.queryExecution.executedPlan.toString
      assert(pc.contains("SortMergeJoin"),
        s"un-estimable filter must not broadcast a fact:\n$pc")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.cbo.enabled", oldCbo)
    }
  }

  test("ANALYZE-provided catalog stats win over the manifest fill-in") {
    val t = sqlLake("analyzed", "cbo_an", 1000)
    spark.sql("ANALYZE TABLE cbo_an COMPUTE STATISTICS")
    // the rule leaves non-empty catalog stats untouched — the plan still
    // resolves and scans correctly
    assert(spark.table("cbo_an").count() === 1000)
    assert(t.currentVersion >= 1)
  }
}
