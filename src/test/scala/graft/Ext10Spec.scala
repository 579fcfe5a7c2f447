package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-12 scale-twin batch: prefix-filtered
  * containment, sampled pair histogram, degree-capped graph variants.
  */
class Ext10Spec extends AnyFunSuite {
  import SparkFixture._

  test("containmentPairsFiltered equals the exact tier pair-for-pair (recall 1)") {
    val docs = Tables.documents(spark, sf)
    val exact = api.DedupOps.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val filt = api.DedupOps.containmentPairsFiltered(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(filt === exact)
  }

  test("declared dedup_containment_filtered is the exact tier restricted to md5 groups") {
    import org.apache.spark.sql.functions.{col, md5, substring}
    val docs = Tables.documents(spark, sf)
    val prefLen = api.DedupOps.samplePrefixLen(docs.count())
    val grp = docs.select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, prefLen).as("grp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exactSameGroup = api.DedupOps.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => grp(p._1) == grp(p._2)).toSet
    val declared = operators.LlmQueries.queries("dedup_containment_filtered")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(declared === exactSameGroup)
  }

  test("containmentPairsFiltered prefix completeness holds on an adversarial subset") {
    // quote/subset shape: doc A is a strict subset of doc B with very
    // different sizes (low Jaccard — the pairs minhash banding misses)
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma " + (1 to 60).map(i => s"w$i").mkString(" ")),
      (3L, "zeta eta theta iota"),
      (4L, (1 to 50).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = api.DedupOps.containmentPairsFiltered(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // C(1,2) = 3/3 = 1.0 ≥ 0.9 even though J = 3/63 ≈ 0.05
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("clusterBlockedPairsAuto collapses to the fixed-k=8 blocking at harness scale") {
    val emb = Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // n/250 <= 8 here, so the auto geometry IS k=8 — same clusters,
    // same pairs (the join-assignment path must reproduce the
    // driver-literal path's dots and tie-breaks)
    val fixed = pairs(api.SimilarityOps.clusterBlockedPairs(
      emb, "vec_id", "embedding", threshold = 0.45, nClusters = 8, iters = 2))
    val auto = pairs(api.SimilarityOps.clusterBlockedPairsAuto(
      emb, "vec_id", "embedding", threshold = 0.45, iters = 2))
    assert(auto === fixed)
  }

  test("sim_pair_hist_sampled buckets are a subset consistent with the exact tier") {
    val exact = operators.Ext8Queries.queries("sim_pair_hist")(spark, sf)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n_pairs")).toMap
    val sampled = operators.Ext8Queries.queries("sim_pair_hist_sampled")(spark, sf)
      .collect()
    assert(sampled.nonEmpty)
    for (r <- sampled) {
      val b = r.getAs[Int]("bucket")
      assert(exact.contains(b), s"sampled bucket $b absent from exact histogram")
      assert(r.getAs[Long]("n_pairs") <= exact(b),
        s"sampled count exceeds exact in bucket $b")
    }
    // the sample is a real subsample, not the full pair set
    assert(sampled.map(_.getAs[Long]("n_pairs")).sum <
      exact.values.sum)
  }

  test("graph_two_hop_capped: capped reach never exceeds uncapped, exact under cap") {
    val un = operators.Ext9Queries.queries("graph_two_hop")(spark, sf)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("reach2")).toMap
    val cp = operators.Ext9Queries.queries("graph_two_hop_capped")(spark, sf).collect()
    assert(cp.nonEmpty)
    assert(cp.exists(_.getAs[Boolean]("capped")),
      "test graph should have at least one node over the cap")
    for (r <- cp) {
      val node = r.getAs[Long]("node")
      assert(r.getAs[Long]("reach2_capped") <= un(node),
        s"capped reach exceeds uncapped at node $node")
    }
  }

  test("dedup_url: canonical groups are never larger than raw URL groups") {
    val rows = operators.Ext10Queries.queries("dedup_url")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_canonical") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
    }
    // canonicalization must actually collapse something on this corpus
    assert(rows.exists(r => r.getAs[Long]("n_canonical") < r.getAs[Long]("n_docs")))
  }

  test("mm_payload_dedup matches text-level exact dedup counts") {
    val rows = operators.Ext10Queries.queries("mm_payload_dedup")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_media")).sum
    assert(total === Tables.documents(spark, sf).count())
    // payload dedup must agree with the corpus's known duplicate texts
    val distinctTexts = Tables.documents(spark, sf)
      .select(col("text")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_distinct_payload")).sum === distinctTexts)
  }

  test("sample_reservoir_hash: exactly 10 per source, stable across runs") {
    val a = operators.Ext10Queries.queries("sample_reservoir_hash")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = operators.Ext10Queries.queries("sample_reservoir_hash")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a === b) // deterministic, unlike a real reservoir
    a.groupBy(_._1).foreach { case (_, g) => assert(g.size == 10) }
  }

  test("emb_outlier_mahal: mean d2 sits near the chi-square mean (64)") {
    val rows = operators.Ext10Queries.queries("emb_outlier_mahal")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val m = r.getAs[Double]("mean_d2")
      assert(m > 20 && m < 200, s"label ${r.get(0)}: implausible mean d2 $m")
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("text_perplexity_filter drops strictly less than 20% per language") {
    val rows = operators.Ext10Queries.queries("text_perplexity_filter")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs"); val d = r.getAs[Long]("n_dropped")
      assert(d <= n / 5, s"lang ${r.get(0)} dropped $d of $n")
    }
  }

  test("retrieval eval metrics are internally consistent") {
    val mrr = operators.Ext10Queries.queries("sim_eval_mrr")(spark, sf).head()
    assert(mrr.getAs[Long]("n_queries") === 10)
    val m = mrr.getAs[Double]("mrr")
    assert(m > 0.0 && m <= 1.0)
    assert(mrr.getAs[Int]("best_rank") >= 1)
    val ndcg = operators.Ext10Queries.queries("sim_eval_ndcg")(spark, sf).collect()
    assert(ndcg.length === 10)
    for (r <- ndcg) {
      assert(r.getAs[Double]("ndcg") >= 0.0 && r.getAs[Double]("ndcg") <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_rel10") <= 10)
    }
    val rec = operators.Ext10Queries.queries("sim_eval_recall_trunc")(spark, sf).collect()
    assert(rec.length === 10)
    for (r <- rec) {
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 10)
      assert(math.abs(r.getAs[Double]("recall10") - n / 10.0) < 1e-9)
    }
    // the 32-dim prefix should retain meaningful signal on this corpus
    assert(rec.map(_.getAs[Long]("n_overlap")).sum >= 10)
  }

  test("win_ratio_to_report shares sum to ~1 within a fully-sampled month") {
    val all = operators.Ext10Queries.queries("win_ratio_to_report")(spark, sf).collect()
    assert(all.nonEmpty)
    assert(all.forall(r => r.getAs[Double]("pct_of_month") > 0 &&
      r.getAs[Double]("pct_of_month") <= 1.0))
  }

  test("events_peak_concurrency: peak within [1, sessions] per day") {
    val rows = operators.Ext10Queries.queries("events_peak_concurrency")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val p = r.getAs[Long]("peak_concurrency")
      assert(p >= 1 && p <= r.getAs[Long]("n_sessions"))
    }
  }

  test("events_day_overlap is symmetric-free and bounded by day audiences") {
    val rows = operators.Ext10Queries.queries("events_day_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val dayUsers = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .groupBy("d").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    for (r <- rows) {
      val d1 = r.getDate(0).toString; val d2 = r.getDate(1).toString
      assert(d1 < d2) // ordered pairs only, no mirror duplicates
      assert(r.getAs[Long]("n_common_users") <=
        math.min(dayUsers(d1), dayUsers(d2)))
    }
  }

  test("graph_clustering_coef_capped: d_capped <= min(d, cap); coef in [0,1]") {
    val rows = operators.Ext8Queries.queries("graph_clustering_coef_capped")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val d = r.getAs[Long]("d")
      val dc = r.getAs[Long]("d_capped")
      assert(dc <= math.min(d, 4L))
      assert(r.getAs[Boolean]("capped") === (d > 4))
      val c = r.getAs[Double]("coef_capped")
      assert(c >= 0.0 && c <= 1.0 + 1e-9)
    }
    // a node under the cap in a fully-kept neighborhood matches the
    // uncapped coefficient: verify on nodes where d == d_capped and all
    // neighbors also uncapped is subtle — instead pin triangle symmetry:
    // total corner count is divisible by 3
    val totalCorners = rows.map(_.getAs[Long]("n_triangles_capped")).sum
    assert(totalCorners % 3 === 0)
  }
}
