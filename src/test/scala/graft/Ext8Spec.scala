package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-11 pack (Ext8Queries): feature
  * engineering, robust trend, decomposition, MI, per-node graph metrics,
  * embedding QC, readability, systematic sampling. The driver
  * hash-checks every declared query against DuckDB at sf0.01; these
  * assert the semantic invariants at sf0.001.
  */
class Ext8Spec extends AnyFunSuite {
  import SparkFixture._

  private def q(name: String) =
    operators.Ext8Queries.queries(name)(spark, sf)

  test("feat_bucketize covers all rows with buckets in [0,9]") {
    val rows = q("feat_bucketize").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.orders(spark, sf).count())
    assert(rows.forall { r => val b = r.getAs[Int]("bucket"); b >= 0 && b <= 9 })
    // bucket edges are monotone: each bucket's max <= next bucket's min
    val sorted = rows.sortBy(_.getAs[Int]("bucket"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi_p") <= b.getAs[Double]("lo_p"))
      case _ =>
    }
  }

  test("feat_quantile_bin bins differ by at most 1 in size and partition the order") {
    val rows = q("feat_quantile_bin").collect()
    assert(rows.length === 4)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= 1)
    assert(ns.sum === Tables.orders(spark, sf).count())
  }

  test("feat_minmax_scale lands in [0,1] and hits both endpoints per nation") {
    val rows = q("feat_minmax_scale").collect()
    assert(rows.forall { r =>
      val v = r.getAs[Double]("scaled"); v >= 0.0 && v <= 1.0 })
    val byNation = rows.groupBy(_.getAs[Int]("c_nationkey"))
    for ((_, rs) <- byNation if rs.length >= 2) {
      assert(rs.map(_.getAs[Double]("scaled")).min === 0.0)
      assert(rs.map(_.getAs[Double]("scaled")).max === 1.0)
    }
  }

  test("feat_zscore standardizes each group to ~zero mean") {
    val z = q("feat_zscore")
    val stats = z.groupBy("l_returnflag")
      .agg(avg("z").as("m"), stddev_samp("z").as("s")).collect()
    for (r <- stats) {
      assert(math.abs(r.getAs[Double]("m")) < 1e-6)
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-3)
    }
  }

  test("feat_onehot rows have exactly one hot column") {
    val rows = q("feat_onehot").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      Seq("pri_urgent", "pri_high", "pri_medium", "pri_notspec", "pri_low")
        .map(r.getAs[Int](_)).sum == 1 })
  }

  test("feat_target_encode shrinks every segment mean toward the global mean") {
    val rows = q("feat_target_encode").collect()
    val global = {
      val o = Tables.orders(spark, sf).agg(
        (sum(Tables.dec2(col("o_totalprice"))).cast("double") / count(lit(1))).as("g"))
      o.collect()(0).getAs[Double]("g")
    }
    for (r <- rows) {
      val seg = r.getAs[Double]("seg_mean"); val enc = r.getAs[Double]("encoded")
      // encoded lies strictly between the segment mean and the global mean
      assert((enc - seg) * (global - seg) >= 0.0, s"not shrunk: $r global=$global")
      assert(math.abs(enc - global) <= math.abs(seg - global) + 1e-9)
    }
  }

  test("stat_ttest_welch emits finite statistics with positive df") {
    val r = q("stat_ttest_welch").collect()(0)
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    assert(!r.getAs[Double]("t_welch").isNaN)
    assert(r.getAs[Double]("df") > 1.0)
  }

  test("ts_theil_sen slope matches a brute-force median of pairwise slopes") {
    val r = q("ts_theil_sen").collect()(0)
    val m = Tables.orders(spark, sf)
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
        .as("mth"))
      .agg(sum(Tables.dec2(col("o_totalprice"))).cast("double").as("r"))
      .collect().map(x => (x.getAs[Int]("mth"), x.getAs[Double]("r"))).sortBy(_._1)
    val slopes = (for {
      (xi, yi) <- m; (xj, yj) <- m if xj > xi
    } yield BigDecimal((yj - yi) / (xj - xi)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble).sorted
    val n = slopes.length
    val med = if (n % 2 == 1) slopes(n / 2) else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
    assert(r.getAs[Long]("n_pairs") === n.toLong)
    assert(math.abs(r.getAs[Double]("slope") - med) < 1e-5)
  }

  test("ts_decompose reassembles: v == trend + seasonal + resid (to 1e-5)") {
    val rows = q("ts_decompose").collect()
    assert(rows.length > 7)
    for (r <- rows) {
      val v = r.getAs[Double]("v")
      val sum3 = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(v - sum3) < 1e-5, s"decomposition broken: $r")
    }
  }

  test("events_mutual_info is nonnegative and bounded by both entropies") {
    val r = q("events_mutual_info").collect()(0)
    val mi = r.getAs[Double]("mi")
    assert(mi >= -1e-9)
    assert(mi <= r.getAs[Double]("h_x") + 1e-9)
    assert(mi <= r.getAs[Double]("h_y") + 1e-9)
  }

  test("graph_clustering_coef: coef in [0,1], triangle totals consistent with graph_triangles") {
    val rows = q("graph_clustering_coef").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("coef"); c >= 0.0 && c <= 1.0 })
    // each triangle contributes exactly 3 node-attributions
    val triSum = rows.map(_.getAs[Long]("n_triangles")).sum
    assert(triSum % 3 === 0)
  }

  test("graph_label_prop labels never exceed node ids and are component-consistent") {
    val rows = q("graph_label_prop").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("lab") <= r.getAs[Long]("node")))
    // 3 rounds can only shrink the label set vs the node set
    assert(rows.map(_.getAs[Long]("lab")).distinct.length <= rows.length)
  }

  test("emb_norm_qc confirms the corpus is unit-normalized") {
    val rows = q("emb_norm_qc").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("max_unit_dev") < 1e-3))
  }

  test("sim_pair_hist counts all vector pairs exactly once") {
    val n = Tables.embeddings(spark, sf).count()
    val total = q("sim_pair_hist").collect().map(_.getAs[Long]("n_pairs")).sum
    assert(total === n * (n - 1) / 2)
  }

  test("text_readability emits one finite score row per language") {
    val rows = q("text_readability").collect()
    assert(rows.length === 5)
    assert(rows.forall(r => !r.getAs[Double]("flesch").isNaN))
  }

  test("sample_systematic keeps every 97th rank exactly") {
    val rows = q("sample_systematic").collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.length === ((total - 1) / 97 + 1).toInt)
    assert(rows.forall(r => (r.getAs[Int]("rn") - 1) % 97 === 0))
  }
}
