package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-11 second batch (Ext9Queries). */
class Ext9Spec extends AnyFunSuite {
  import SparkFixture._

  private def q(name: String) =
    operators.Ext9Queries.queries(name)(spark, sf)

  test("orders_cohort_ltv: ltv is nondecreasing within each cohort") {
    val rows = q("orders_cohort_ltv").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Int]("cohort"))
    for ((_, rs) <- byCohort) {
      val ltv = rs.sortBy(_.getAs[Int]("age")).map(_.getAs[Double]("ltv"))
      ltv.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-9)
        case _ =>
      }
    }
    // age-0 cell exists for every cohort (a cohort is born with an order)
    assert(byCohort.values.forall(_.exists(_.getAs[Int]("age") == 0)))
  }

  test("emb_dim_stats covers all 64 dimensions with full counts") {
    val rows = q("emb_dim_stats").collect()
    assert(rows.length === 64)
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.forall(_.getAs[Long]("n") === n))
    assert(rows.forall(r => r.getAs[Double]("min_x") <= r.getAs[Double]("max_x")))
  }

  test("sim_centroid_classify classifies every vector, accuracy well above chance") {
    val rows = q("sim_centroid_classify").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.embeddings(spark, sf).count())
    val correct = rows.map(_.getAs[Long]("n_correct")).sum
    // 10 labels → chance is 0.1; centroid classification must beat it
    assert(correct.toDouble / total > 0.3, s"accuracy ${correct.toDouble / total}")
  }

  test("graph_two_hop reach is at least the direct degree") {
    val rows = q("graph_two_hop").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("reach2") >= r.getAs[Long]("d")))
  }

  test("etl_fk_orphans audits all 7 edges and the synthetic schema is clean") {
    val rows = q("etl_fk_orphans").collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getAs[Boolean]("ok")), rows.mkString(", "))
  }

  test("orders_price_elasticity emits one finite slope per brand") {
    val rows = q("orders_price_elasticity").collect()
    assert(rows.length === 25)
    assert(rows.forall(r => !r.getAs[Double]("elasticity").isNaN))
    assert(rows.forall { r =>
      val r2 = r.getAs[Double]("r2"); r2 >= -1e-9 && r2 <= 1.0 + 1e-9 })
  }

  test("ts_ljung_box Q statistic is positive and strictly increasing in lag") {
    val rows = q("ts_ljung_box").collect().sortBy(_.getAs[Int]("lag"))
    assert(rows.length === 10)
    val qs = rows.map(_.getAs[Double]("q_stat"))
    assert(qs.head > 0.0 || qs.head === 0.0)
    qs.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9, s"Q not monotone: $a -> $b")
      case _ =>
    }
  }

  test("orders_theil_index: indices are nonnegative and Atkinson < 1") {
    val r = q("orders_theil_index").collect()(0)
    assert(r.getAs[Double]("theil") >= -1e-9)
    val atk = r.getAs[Double]("atkinson")
    assert(atk >= -1e-9 && atk < 1.0)
  }

  test("ts_rolling_corr stays within [-1, 1]") {
    val rows = q("ts_rolling_corr").collect()
    assert(rows.nonEmpty)
    for (r <- rows; v = r.getAs[Any]("r14") if v != null) {
      val d = v.asInstanceOf[Double]
      assert(d >= -1.0 - 1e-9 && d <= 1.0 + 1e-9)
    }
  }

  test("ts_bollinger: v stays inside bands except on breach rows, ma between bands") {
    val rows = q("ts_bollinger").collect()
    assert(rows.nonEmpty)
    for (r <- rows if r.getAs[Any]("upper") != null) {
      val v = r.getAs[Double]("v"); val up = r.getAs[Double]("upper")
      val lo = r.getAs[Double]("lower"); val breach = r.getAs[Boolean]("breach")
      assert(breach === (v > up || v < lo), s"flag mismatch: $r")
      assert(r.getAs[Double]("ma") >= lo && r.getAs[Double]("ma") <= up)
    }
  }

  test("ts_rsi stays within [0, 100]") {
    val rows = q("ts_rsi").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val x = r.getAs[Double]("rsi"); x >= 0.0 && x <= 100.0 })
  }

  test("ts_forecast_snaive_drift emits 7 strictly future horizons") {
    val rows = q("ts_forecast_snaive_drift").collect()
    assert(rows.length === 7)
    assert(rows.map(_.getAs[Int]("h")).sorted.sameElements(1 to 7))
    val lastDay = Tables.events(spark, sf)
      .select(max(to_date(col("ts")))).collect()(0).getDate(0)
    assert(rows.forall(_.getAs[java.sql.Date]("forecast_day").after(lastDay)))
  }

  test("text_burstiness: top-20 by occurrences, burstiness positive") {
    val rows = q("text_burstiness").collect()
    assert(rows.length === 20)
    val occ = rows.map(_.getAs[Long]("n_occ"))
    occ.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    assert(rows.forall(_.getAs[Double]("burstiness") > 0.0))
  }

  test("stat_delta_method_ci: CI brackets the ratio and se > 0") {
    val r = q("stat_delta_method_ci").collect()(0)
    assert(r.getAs[Double]("se") > 0.0)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ratio"))
    assert(r.getAs[Double]("ci_hi") > r.getAs[Double]("ratio"))
  }

  test("stat_sample_size: n is positive and grows as delta shrinks (sanity)") {
    val r = q("stat_sample_size").collect()(0)
    assert(r.getAs[Long]("n_per_group") > 0L)
    assert(r.getAs[Double]("var_sum") > 0.0)
  }

  test("domain_mix_temperature: weights sum to ~1 and flatten the mix") {
    val rows = q("domain_mix_temperature").collect()
    assert(rows.length === 20)
    val wsum = rows.map(_.getAs[Double]("w")).sum
    assert(math.abs(wsum - 1.0) < 1e-3)
    // temperature flattening: max weight below max raw share, min above
    val shares = rows.map(_.getAs[Double]("share"))
    val ws = rows.map(_.getAs[Double]("w"))
    assert(ws.max <= shares.max + 1e-9)
    assert(ws.min >= shares.min - 1e-9)
  }

  test("text_bigram_logprob: logprobs negative, perplexity consistent and above 1") {
    val rows = q("text_bigram_logprob").collect()
    assert(rows.length === 5)
    for (r <- rows) {
      val lp = r.getAs[Double]("mean_logprob")
      val ppl = r.getAs[Double]("perplexity")
      assert(lp < 0.0)
      assert(ppl > 1.0)
      assert(math.abs(ppl - math.exp(-lp)) < 0.01, s"ppl inconsistent: $r")
    }
  }

  test("sample_temperature: kept fraction tracks the declared rate per source") {
    val rows = q("sample_temperature").collect()
    assert(rows.length === 20)
    // md5 is uniform: observed keep fraction within a loose binomial
    // band of the declared rate (25 docs/source at sf0.001 → wide band)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs"); val kept = r.getAs[Long]("n_kept")
      val rate = r.getAs[Double]("rate")
      val se = math.sqrt(rate * (1 - rate) / n)
      assert(math.abs(kept.toDouble / n - rate) < 4 * se + 0.05,
        s"keep fraction off: $r")
    }
    // the largest source is sampled at the 0.9 cap
    assert(rows.map(_.getAs[Double]("rate")).max === 0.9)
  }

  test("agg_ratio_to_parent: shares sum to 1 within each region and overall") {
    val rows = q("agg_ratio_to_parent").collect()
    assert(rows.length === 25)
    for ((_, rs) <- rows.groupBy(_.getAs[String]("r_name"))) {
      assert(math.abs(rs.map(_.getAs[Double]("share_of_region")).sum - 1.0) < 1e-3)
      // region share is constant within the region
      assert(rs.map(_.getAs[Double]("region_share_of_total")).distinct.length === 1)
    }
    val regionShares = rows.groupBy(_.getAs[String]("r_name"))
      .map(_._2.head.getAs[Double]("region_share_of_total")).sum
    assert(math.abs(regionShares - 1.0) < 1e-3)
  }

  test("events_bot_detect covers every multi-event user with sane metrics") {
    val rows = q("events_bot_detect").collect()
    assert(rows.nonEmpty)
    // a user with exactly 2 events has one gap → stddev_samp is null →
    // gap_cv/bot_flag are null (on both engines); guard before unboxing
    val gapIdx = rows.head.fieldIndex("gap_cv")
    val flagIdx = rows.head.fieldIndex("bot_flag")
    val withCv = rows.filterNot(r => r.isNullAt(gapIdx))
    assert(withCv.forall(_.getAs[Double]("gap_cv") >= 0.0))
    assert(rows.forall(_.getAs[Long]("max_per_min") >= 1L))
    // flag definition holds row-wise on the non-null rows
    assert(withCv.filterNot(_.isNullAt(flagIdx)).forall { r =>
      r.getAs[Boolean]("bot_flag") ===
        (r.getAs[Long]("max_per_min") >= 5 || r.getAs[Double]("gap_cv") < 0.1) })
  }

  test("ts_peaks: every peak beats both neighbors with positive prominence") {
    val rows = q("ts_peaks").collect()
    assert(rows.forall(_.getAs[Double]("prominence") > 0.0))
    // peaks are a strict subset of days
    val nDays = Tables.events(spark, sf).select(to_date(col("ts"))).distinct().count()
    assert(rows.length < nDays)
  }
}
