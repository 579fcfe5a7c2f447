package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior specs for the round-13 second batch. */
class Ext12Spec extends AnyFunSuite {
  import SparkFixture._

  private def q(name: String) = operators.Ext12Queries.queries(name)(spark, sf)

  test("graph_sample_neighbors fan-outs respect the k=3 cap") {
    val rows = q("graph_sample_neighbors").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_h1") <= 3)
      assert(r.getAs[Long]("n_h2") <= 9,
        s"2-hop distinct sample cannot exceed k^2: $r")
    }
  }

  test("ts_esd_outliers removes three distinct days with positive z") {
    val rows = q("ts_esd_outliers").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[java.sql.Date]("d")).distinct.length === 3)
    rows.foreach(r => assert(r.getAs[Double]("z") > 0))
  }

  test("sample_two_stage: 20 clusters max, 3 per cluster max") {
    val rows = q("sample_two_stage").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= 3)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_orders"))
    }
  }

  test("stat_did is the exact cell-mean combination") {
    val r = q("stat_did").head()
    val did = (r.getAs[Double]("m_t_post") - r.getAs[Double]("m_t_pre")) -
      (r.getAs[Double]("m_c_post") - r.getAs[Double]("m_c_pre"))
    assert(math.abs(did - r.getAs[Double]("did")) < 1e-5)
  }

  test("sketch_hll_intersect estimate lands within its pinned band") {
    val r = q("sketch_hll_intersect").head()
    assert(r.getAs[Boolean]("estimate_within_20pct"))
    assert(r.getAs[Long]("n_intersect") <= math.min(
      r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
  }

  test("dedup_cdc ledger balances and chunks average near the 1/p target") {
    val rows = q("dedup_cdc").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_chunks")))
    // p = 1/16 boundary probability → mean chunk length ~16 tokens; the
    // per-source chunk count should be within a loose band of tokens/16
    val totChunks = rows.map(_.getAs[Long]("n_chunks")).sum
    val totToks = Tables.documents(spark, sf)
      .select(size(filter(split(col("text"), " "), t => t =!= lit("")))
        .cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(totChunks >= totToks / 40 && totChunks <= totToks / 6,
      s"$totChunks chunks for $totToks tokens is outside the CDC band")
  }

  test("stat_cuped preserves means and does not inflate variance") {
    val rows = q("stat_cuped").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_raw") - r.getAs[Double]("mean_cuped"))
        <= math.abs(r.getAs[Double]("mean_raw")) * 0.05,
        s"CUPED must roughly preserve the group mean: $r")
      assert(r.getAs[Double]("var_ratio") <= 1.05, s"variance inflated: $r")
    }
  }

  test("stat_srm flag is exactly the chi2-vs-critical-value comparison") {
    // at the fixture's tiny sf the 15-user split can legitimately trip
    // the detector — pin the flag's CONSISTENCY, not a fixed outcome
    val r = q("stat_srm").head()
    assert(r.getAs[Boolean]("srm_detected") === (r.getAs[Double]("chi2") > 3.841))
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") > 0)
  }

  test("graph_adamic_adar_capped returns a deterministic top-10 with sane scores") {
    val rows = q("graph_adamic_adar_capped").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_common") >= 2)
      assert(r.getAs[Double]("score") > 0)
    }
  }

  test("sample_balanced equalizes every class at the minority count") {
    val rows = q("sample_balanced").collect()
    val kept = rows.map(_.getAs[Long]("n_kept")).distinct
    assert(kept.length === 1, s"all classes must keep the same count: ${kept.toSeq}")
    rows.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_before")))
  }

  test("text_train_coverage is a proper fraction with covered <= total") {
    q("text_train_coverage").collect().foreach { r =>
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_test_bigrams"))
      val c = r.getAs[Double]("coverage")
      assert(c >= 0 && c <= 1)
    }
  }

  test("orders_price_index is positive with near-full part overlap") {
    val rows = q("orders_price_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("laspeyres") > 0)
      assert(r.getAs[Long]("n_parts") > 0)
    }
  }

  test("events_hour_uniformity flag matches its chi2 comparison") {
    q("events_hour_uniformity").collect().foreach { r =>
      assert(r.getAs[Boolean]("nonuniform") === (r.getAs[Double]("chi2") > 35.172))
      assert(r.getAs[Long]("n_hours") <= 24)
    }
  }

  test("join_spatial_grid candidate recall is 1 (grid equals brute force)") {
    // brute force over the same synthesized points at the fixture sf
    val pts = Tables.customer(spark, sf).select(col("c_custkey").as("id"),
      (lit(30.0) + pmod(pmod(col("c_custkey"), lit(6007L)) * 4999L,
        lit(6007L)) * lit(30.0) / lit(6007.0)).as("lat"),
      (lit(-30.0) + pmod(pmod(col("c_custkey"), lit(9973L)) * 7919L,
        lit(9973L)) * lit(60.0) / lit(9973.0)).as("lon"))
    val a = pts.select(col("id").as("id_a"), col("lat").as("la"), col("lon").as("loa"))
    val b = pts.select(col("id").as("id_b"), col("lat").as("lb"), col("lon").as("lob"))
    val km = lit(2.0) * lit(6371.0) * asin(sqrt(
      pow(sin(radians(col("lb") - col("la")) / 2), 2) +
        cos(radians(col("la"))) * cos(radians(col("lb"))) *
          pow(sin(radians(col("lob") - col("loa")) / 2), 2)))
    val bf = a.join(b, col("id_a") < col("id_b"))
      .withColumn("km", round(km, 6)).filter(col("km") <= 100.0)
      .groupBy(floor(col("km") / 10).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val grid = q("join_spatial_grid")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(grid === bf, s"grid join must find every qualifying pair: $grid vs $bf")
  }
}
