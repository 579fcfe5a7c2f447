package graft

import org.scalatest.funsuite.AnyFunSuite

/** Functional invariants of the corpus-build flagship that the DuckDB
  * hash-compare can't express: funnel monotonicity and manifest/funnel
  * consistency.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val rows =
    SparkEntry.queries("pipeline_corpus_build")(spark, sf).collect()

  test("manifest covers all 8 shards") {
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 7L))
  }

  test("funnel is monotone nonincreasing and every stage bites") {
    val r = rows.head
    val funnel = (5 to 10).map(r.getLong) // n_raw..n_clean
    assert(funnel.zip(funnel.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $funnel")
    assert(funnel.last > 0, "pipeline must keep some documents")
    // the near-dedup, gopher and contamination gates must each drop
    // at least one doc on the test corpus (a vacuous gate is a bug in
    // the gate, not a property of the data — thresholds were chosen
    // against the measured distributions)
    assert(funnel(1) > funnel(2), s"near-dedup dropped nothing: $funnel")
    assert(funnel(2) > funnel(3), s"gopher gate dropped nothing: $funnel")
    assert(funnel(4) > funnel(5), s"contamination dropped nothing: $funnel")
  }

  test("shard doc counts sum to the funnel's n_clean") {
    assert(rows.map(_.getLong(1)).sum == rows.head.getLong(10))
  }

  test("packs are budget-consistent: tokens per shard ≤ 64 * packs + 63") {
    rows.foreach { r =>
      val tokens = r.getLong(3); val packs = r.getLong(4)
      // each pack holds up to 64 tokens of chunk mass; the last pack
      // may be partial, and one chunk can straddle two packs, so the
      // bound is packs ≥ ceil(tokens / 64) ... ≤ tokens/64 + 1
      assert(packs >= (tokens + 63) / 64, s"too few packs: $r")
      assert(packs <= tokens / 64 + 1, s"too many packs: $r")
    }
  }
}
