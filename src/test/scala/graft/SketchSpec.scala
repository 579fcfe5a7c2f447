package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch semantics: HLL sketches built on disjoint frames and
  * unioned must estimate the GLOBAL distinct count — the 100 TB
  * dedup-accounting path where re-scanning raw data per reporting frame
  * is not an option.
  */
class SketchSpec extends AnyFunSuite {
  import SparkFixture._

  test("sketch_hll_merge estimate is within the sketch error band of exact") {
    val r = SparkEntry.queries("sketch_hll_merge")(spark, sf).head()
    assert(r.getAs[Boolean]("bound_ok"),
      s"merged estimate outside 5% of exact ${r.getAs[Long]("exact_parts")}")
  }

  test("union of disjoint-half sketches estimates the global cardinality") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, i % 500)).toDF("id", "k")
    val whole = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est")).head().getLong(0)
    val a = df.filter(col("id") % 2 === 0).agg(hll_sketch_agg(col("k")).as("sk_a"))
    val b = df.filter(col("id") % 2 === 1).agg(hll_sketch_agg(col("k")).as("sk_b"))
    val merged = a.crossJoin(b)
      .select(hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("est"))
      .head().getLong(0)
    // the union path rebuilds the estimator, so registers (and the
    // estimate) may differ from the whole-frame sketch by a hair — both
    // must land in the lgK=12 error band around the true 500
    assert(math.abs(merged - 500L) <= 25, s"merged estimate $merged too far from 500")
    assert(math.abs(whole - 500L) <= 25, s"whole estimate $whole too far from 500")
  }

  test("count-min: estimates dominate exact counts and merge elementwise") {
    import spark.implicits._
    import graft.functions.{CountMinLongs, CountMinSketchOps}
    val d = 4; val w = 64
    // skewed multiset: key i appears i times, keys 1..50
    val df = (1L to 50L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("k")
      .withColumn("id", monotonically_increasing_id())
    val whole = df.agg(CountMinLongs.countMin(col("k"), d, w).as("sk"))
      .head().getSeq[Long](0)
    // CMS guarantee per key: est >= exact (always)
    (1L to 50L).foreach { i =>
      val est = CountMinSketchOps.estimate(whole, i, d, w)
      assert(est >= i, s"key $i: est $est < exact $i")
    }
    // elementwise merge of disjoint-half sketches == whole-frame sketch
    val a = df.filter(col("id") % 2 === 0).agg(CountMinLongs.countMin(col("k"), d, w).as("sk"))
      .head().getSeq[Long](0)
    val b = df.filter(col("id") % 2 === 1).agg(CountMinLongs.countMin(col("k"), d, w).as("sk"))
      .head().getSeq[Long](0)
    val merged = a.zip(b).map { case (x, y) => x + y }
    assert(merged == whole, "merged disjoint-half sketches differ from whole-frame sketch")
    // total mass per row equals N (conservation — no dropped updates)
    val n = df.count()
    (0 until d).foreach { r =>
      assert(whole.slice(r * w, (r + 1) * w).sum == n, s"row $r mass != $n")
    }
  }

  test("sketch_cms declared report: every event type inside the CMS band") {
    val rows = SparkEntry.queries("sketch_cms")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cms_ok"), s"${r.getAs[String]("event_type")} outside CMS band")
    }
  }
}
