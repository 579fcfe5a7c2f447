package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-14 pack. */
class Ext13Spec extends AnyFunSuite {
  import SparkFixture._

  private def q(name: String) = operators.Ext13Queries.queries(name)(spark, sf)

  test("agg_gini values sit in [0, 1) and groups are the five segments") {
    val rows = q("agg_gini").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
  }

  test("agg_theil is non-negative (Jensen) and zero only under equality") {
    val rows = q("agg_theil").collect()
    assert(rows.length === 5)
    rows.foreach(r => assert(r.getAs[Double]("theil_t") >= 0.0))
  }

  test("ts_mad_anomaly: anomaly count never exceeds day count; z positive") {
    val rows = q("ts_mad_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_anomalies") <= r.getAs[Long]("n_days"))
      assert(r.getAs[Double]("max_robust_z") >= 0.0)
    }
  }

  test("stat_power_twoprop: arms partition the users, n_per_arm positive") {
    val r = q("stat_power_twoprop").head()
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    assert(r.getAs[Double]("n_per_arm") > 0)
  }

  test("stat_quantile_ci bounds bracket the median") {
    q("stat_quantile_ci").collect().foreach { r =>
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("med"))
      assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("med"))
    }
  }

  test("stat_mann_kendall |S| is bounded by the pair count") {
    q("stat_mann_kendall").collect().foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2)
    }
  }

  test("dedup_soft_weights: weights in (0,1], effective <= raw count") {
    val rows = q("dedup_soft_weights").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Double]("mean_weight")
      assert(w > 0.0 && w <= 1.0)
      assert(r.getAs[Double]("effective_docs") <= r.getAs[Long]("n_docs") + 1e-9)
    }
  }

  test("sample_importance: weighted masses equalize and ESS <= 1") {
    val rows = q("sample_importance").collect()
    val masses = rows.map(_.getAs[Double]("weighted_mass")).distinct
    assert(masses.length === 1, s"uniform target must equalize masses: ${masses.toSeq}")
    rows.foreach { r =>
      val e = r.getAs[Double]("ess_ratio")
      assert(e > 0.0 && e <= 1.0 + 1e-9)
    }
  }

  test("text_ngram_novelty is a fraction of the val bigram count") {
    q("text_ngram_novelty").collect().foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_val_bigrams"))
      val f = r.getAs[Double]("novelty")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("events_funnel_time percentiles are ordered") {
    val r = q("events_funnel_time").head()
    assert(r.getAs[Long]("n_converted") > 0)
    assert(r.getAs[Double]("median_s") <= r.getAs[Double]("p90_s"))
  }

  test("win_percent_rank: top decile's share exceeds 10% of spend (right tail)") {
    q("win_percent_rank").collect().foreach { r =>
      val share = r.getAs[Double]("top_decile_share")
      assert(share > 0.10 && share < 1.0, s"top-decile share implausible: $r")
    }
  }

  test("stat_welch_ttest df lies between min(n)-1 and n_a+n_b-2") {
    val r = q("stat_welch_ttest").head()
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val df = r.getAs[Double]("df")
    assert(df >= math.min(na, nb) - 1 - 1e-6 && df <= na + nb - 2 + 1e-6)
  }

  test("stat_chisq_independence: chi2 >= 0, cramers_v in [0,1]") {
    val r = q("stat_chisq_independence").head()
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Long]("df") === 4L * 19L) // 5 langs x 20 sources
  }

  test("stat_levene F is non-negative over the five segments") {
    val r = q("stat_levene").head()
    assert(r.getAs[Long]("k") === 5)
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("text_heaps_law: sublinear growth (0 < beta < 1) and vocab <= tokens") {
    val r = q("text_heaps_law").head()
    val b = r.getAs[Double]("beta")
    assert(b > 0.0 && b < 1.0, s"trigram Heaps exponent implausible: $r")
    assert(r.getAs[Long]("vocab") <= r.getAs[Long]("tokens"))
  }

  test("text_js_divergence values sit in [0, ln 2]") {
    q("text_js_divergence").collect().foreach { r =>
      val d = r.getAs[Double]("jsd")
      assert(d >= 0.0 && d <= math.log(2.0) + 1e-9, s"JSD out of range: $r")
    }
  }

  test("ts_weekday_strength is a fraction") {
    q("ts_weekday_strength").collect().foreach { r =>
      val v = r.getAs[Double]("weekday_strength")
      assert(v >= 0.0 && v <= 1.0)
    }
  }

  test("ts_naive_mape scores exactly the days with a d-7 ancestor; smape <= 2") {
    q("ts_naive_mape").collect().foreach { r =>
      assert(r.getAs[Long]("n_scored") > 0)
      assert(r.getAs[Double]("smape") <= 2.0 + 1e-9)
      assert(r.getAs[Double]("mape") >= 0.0)
    }
  }

  test("graph_rich_club: phi is a density in [0,1], rich set non-empty") {
    val r = q("graph_rich_club").head()
    assert(r.getAs[Long]("n_rich") > 1)
    val phi = r.getAs[Double]("phi")
    assert(phi >= 0.0 && phi <= 1.0)
    assert(r.getAs[Long]("e_rich") <=
      r.getAs[Long]("n_rich") * (r.getAs[Long]("n_rich") - 1) / 2)
  }

  test("sample_pps: five pointers, each landing in exactly one source stratum") {
    val rows = q("sample_pps").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[Long]("pointer")).sorted.sameElements(0L to 4L))
    rows.foreach(r => assert(r.getAs[Long]("mass") > 0))
  }

  test("stat_cohens_d is the mean difference over the pooled SD") {
    val r = q("stat_cohens_d").head()
    assert(r.getAs[Double]("pooled_sd") > 0.0)
    assert(math.abs(r.getAs[Double]("cohens_d")) < 5.0)
  }

  test("stat_runs_test: runs bounded by sign changes + 1; z finite") {
    q("stat_runs_test").collect().foreach { r =>
      val runs = r.getAs[Long]("runs")
      val total = r.getAs[Long]("n_up") + r.getAs[Long]("n_down")
      assert(runs >= 1 && runs <= total)
      assert(!r.getAs[Double]("z").isNaN)
    }
  }

  test("stat_jarque_bera: jb >= 0 and matches its moment components") {
    q("stat_jarque_bera").collect().foreach { r =>
      val jb = r.getAs[Double]("jb")
      val n = r.getAs[Long]("n")
      val s = r.getAs[Double]("skew")
      val k = r.getAs[Double]("ex_kurt")
      assert(jb >= 0.0)
      assert(math.abs(jb - n / 6.0 * (s * s + k * k / 4)) < 0.01,
        s"jb inconsistent with moments: $r")
    }
  }

  test("graph_eigen_centrality: 20 ranked nodes, descending, positive") {
    val rows = q("graph_eigen_centrality").collect()
    assert(rows.length === 20)
    val cs = rows.map(_.getAs[Double]("centrality"))
    assert(cs.sameElements(cs.sorted.reverse))
    assert(cs.forall(_ > 0.0))
  }
}
