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
}
