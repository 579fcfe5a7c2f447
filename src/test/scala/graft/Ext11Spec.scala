package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-13 pack: block-level dedup ledgers,
  * DSIR weighting, hash-bootstrap CIs, frequency moments, SCD2 as-of
  * joins, Markov stationary distributions, shard manifests, Neyman
  * allocation.
  */
class Ext11Spec extends AnyFunSuite {
  import SparkFixture._

  private def q(name: String) = operators.Ext11Queries.queries(name)(spark, sf)

  test("dedup_paragraph ledger balances and the corpus has real block dups") {
    val rows = q("dedup_paragraph").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ===
        r.getAs[Long]("n_blocks"))
    }
    assert(rows.map(_.getAs[Long]("n_removed")).sum > 0,
      "synthetic corpus should contain duplicate 20-token blocks")
  }

  test("text_dsir scores the target language (en) highest") {
    val rows = q("text_dsir").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_w")).toMap
    assert(rows("en") === rows.values.max,
      s"target strata must have the top mean importance weight: $rows")
    assert(rows("en") > 0, "target-like docs score positive log-ratios")
  }

  test("stat_bootstrap_ci brackets the point estimate with 32 resamples") {
    val r = q("stat_bootstrap_ci").head()
    assert(r.getAs[Long]("n_resamples") === 32L)
    val (lo, mid, hi) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("boot_mean"), r.getAs[Double]("ci_hi"))
    assert(lo <= mid && mid <= hi)
    val trueMean = Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.avg("o_totalprice")).head().getDouble(0)
    assert(math.abs(mid - trueMean) / trueMean < 0.05,
      s"bootstrap mean $mid should track the true mean $trueMean")
  }

  test("agg_f2_selfjoin skew respects the Cauchy-Schwarz floor of 1.0") {
    val rows = q("agg_f2_selfjoin").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      // F2·F0 ≥ F1² always; 6dp rounding can nip a hair under
      assert(r.getAs[Double]("skew") >= 0.999999, r.toString)
      assert(r.getAs[Long]("f2") >= r.getAs[Long]("f1"))
    }
  }

  test("join_scd2_asof: every order resolves exactly one validity row") {
    val rows = q("join_scd2_asof").collect()
    val totalJoined = rows.map(_.getAs[Long]("n_orders")).sum
    assert(totalJoined === Tables.orders(spark, sf).count(),
      "validity intervals must partition each customer's timeline")
    assert(rows.exists(_.getString(0) == "UPDATED"),
      "orders after the 1998 effective date must land in the new segment")
  }

  test("events_markov_stationary is a near-probability vector, all states live") {
    val rows = q("events_markov_stationary").collect()
    val ps = rows.map(_.getAs[Double]("stationary_p"))
    assert(rows.length >= 2)
    assert(ps.forall(_ > 0))
    assert(math.abs(ps.sum - 1.0) < 1e-3,
      s"12 rounded power iterations should stay normalized: sum=${ps.sum}")
  }

  test("mm_shard_manifest shards are contiguous and conserve bytes per origin") {
    val rows = q("mm_shard_manifest").collect()
    val byOrigin = rows.groupBy(_.getString(0))
    byOrigin.foreach { case (_, rs) =>
      val shards = rs.map(_.getAs[Int]("shard")).sorted
      assert(shards.head === 0 && shards === (0 until rs.length).toArray,
        s"shard ids must be contiguous from 0: ${shards.toSeq}")
      rs.foreach(r => assert(r.getAs[Long]("first_id") <= r.getAs[Long]("last_id")))
    }
    val manifestBytes = rows.map(_.getAs[Long]("shard_bytes")).sum
    val trueBytes = operators.MultimodalQueries.mediaTable(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.octet_length(
          org.apache.spark.sql.functions.col("payload")))).head().getLong(0)
    assert(manifestBytes === trueBytes)
  }

  test("text_kn_bigram log-probs are proper (negative) and per-lang complete") {
    val rows = q("text_kn_bigram").collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(r.getAs[Double]("mean_kn_lp") < 0, r.toString))
  }

  test("ts_changepoint_binary picks the max-gap split per type") {
    val rows = q("ts_changepoint_binary").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Double]("gap")
      assert(gap > 0)
      assert(math.abs(math.abs(r.getAs[Double]("mean_left") -
        r.getAs[Double]("mean_right")) - gap) < 2e-6)
    }
  }

  test("events_rolling_distinct trailing-7 dominates the single day") {
    val rows = q("events_rolling_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("u7") >= r.getAs[Long]("u1")))
  }

  test("join_asof_tolerance: fresh matches are a subset and gaps are in-bound") {
    val rows = q("join_asof_tolerance").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fresh") <= r.getAs[Long]("n_purchases"))
      if (!r.isNullAt(r.fieldIndex("avg_fresh_minutes"))) {
        val m = r.getAs[Double]("avg_fresh_minutes")
        assert(m >= 0 && m <= 24 * 60, s"staleness bound violated: $m min")
      }
    }
  }

  test("stat_bh_fdr p-values are proper and rejections are a prefix of the p-ranking") {
    val rows = q("stat_bh_fdr").collect()
    assert(rows.length >= 2)
    rows.foreach(r => {
      val p = r.getAs[Double]("p")
      assert(p >= 0 && p <= 1)
    })
    val byP = rows.sortBy(_.getAs[Double]("p")).map(_.getAs[Boolean]("rejected"))
    // step-up: once a rank is not rejected, no later rank is
    assert(!byP.dropWhile(identity).contains(true))
  }

  test("sample_neyman allocation is within budget and proportional-to-spread") {
    val rows = q("sample_neyman").collect()
    val allocs = rows.map(_.getAs[Int]("n_alloc"))
    assert(allocs.forall(a => a >= 1 && a <= 100))
    // floors lose at most 1 per stratum; greatest(1,·) adds at most 1
    assert(allocs.sum <= 100 + rows.length && allocs.sum >= 100 - rows.length)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_alloc") <= r.getAs[Long]("n_pop"))
    }
  }
}
