package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Targeted assertions for the round-3 additions: time-series gap-fill /
  * LOCF, deterministic mode, boolean aggregates, histograms, digests,
  * PII scrubbing, token chunking, and int8 embedding quantization.
  */
class ExtraOpsSpec extends AnyFunSuite {
  import SparkFixture._

  test("ts_gapfill emits a complete (priority x day) spine with zero-filled gaps") {
    val df = SparkEntry.queries("ts_gapfill")(spark, sf).cache()
    val nPrios = df.select("prio").distinct().count()
    val nDays = df.select("day").distinct().count()
    assert(nDays === 90, "Jan 1 .. Mar 31 1995 inclusive")
    assert(df.count() === nPrios * nDays, "spine must be dense")
    // sf0.001 has ~1500 orders over ~2400 days -> most slots in the window
    // are empty and must appear as explicit zero rows
    assert(df.filter(col("n") === 0 && col("total") === 0.0).count() > 0)
    df.unpersist()
  }

  test("ts_locf fills every null from the user's most recent prior value") {
    val df = SparkEntry.queries("ts_locf")(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(df.count() === ev.count(), "LOCF is row-preserving")
    // a filled value is null only if the user had no prior non-click event;
    // re-derive with a self-consistent two-pass check: nulls remaining in
    // filled_v must be leading rows of their user's series
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val firstFill = df.withColumn("saw_value",
      count(col("filled_v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    assert(firstFill.filter(col("filled_v").isNull && col("saw_value") > 0).count() === 0)
    df.unpersist()
  }

  test("agg_mode returns exactly one deterministic winner per status") {
    val rows = SparkEntry.queries("agg_mode")(spark, sf).collect()
    assert(rows.map(_.getString(0)).distinct.length === rows.length)
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("agg_histogram buckets partition the orders exactly") {
    val df = SparkEntry.queries("agg_histogram")(spark, sf)
    val total = df.agg(sum(col("n"))).head().getLong(0)
    assert(total === Tables.orders(spark, sf).count())
    // per-bucket min/max must fall inside the bucket bounds
    val bad = df.filter(col("lo") < col("bucket_lo") ||
      col("hi") >= col("bucket_lo") + 20000).count()
    assert(bad === 0)
  }

  test("fn_hash digests have canonical hex shapes") {
    val df = SparkEntry.queries("fn_hash")(spark, sf)
    assert(df.filter(length(col("md5_name")) =!= 32).count() === 0)
    assert(df.filter(col("sha_len") =!= 64).count() === 0)
    assert(df.filter(col("md5_name").rlike("^[0-9a-f]{32}$")).count() === df.count())
  }

  test("text_pii_scrub removes every salted email and phone") {
    val df = SparkEntry.queries("text_pii_scrub")(spark, sf).cache()
    assert(df.filter(col("has_pii_after")).count() === 0)
    assert(df.filter(!col("had_email")).count() === 0)
    assert(df.filter(!col("clean").contains("<EMAIL>")).count() === 0)
    assert(df.filter(!col("clean").contains("<PHONE>")).count() === 0)
    df.unpersist()
  }

  test("doc_chunk covers every token with stride-4 windows of <= 8 tokens") {
    val df = SparkEntry.queries("doc_chunk")(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    // chunks per doc == number of stride starts: floor((n-1)/4) + 1
    val perDoc = df.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"),
      max(col("n_chunk_toks")).as("max_ct"), min(col("n_chunk_toks")).as("min_ct"))
    val joined = perDoc.join(docs, "doc_id")
    assert(joined.filter(col("n_chunks") =!=
      (floor((col("n_toks") - 1) / 4) + 1)).count() === 0)
    assert(df.filter(col("n_chunk_toks") > 8 || col("n_chunk_toks") < 1).count() === 0)
    // full-window chunks dominate; the tail chunks shrink
    assert(joined.filter(col("max_ct") > col("n_toks"))
      .count() === 0)
    df.unpersist()
  }

  test("emb_quantize error is bounded by half a quantization step") {
    val df = SparkEntry.queries("emb_quantize")(spark, sf)
    // |v - q/127| <= 0.5/127 for |v| <= 1 under floor(x*127 + 0.5)
    assert(df.filter(col("max_err") > 0.5 / 127 + 1e-9).count() === 0)
    // quantized csv has exactly 64 entries
    assert(df.filter(size(split(col("q_csv"), ",")) =!= 64).count() === 0)
  }

  test("etl_scd2 keeps exactly one current row per key and dates chain") {
    val df = SparkEntry.queries("etl_scd2")(spark, sf).cache()
    val nKeys = Tables.customer(spark, sf).count()
    val current = df.filter(col("is_current"))
    assert(current.count() === nKeys, "every key has exactly one current row")
    assert(current.select("c_custkey").distinct().count() === nKeys)
    // expired rows must carry a valid_to, current rows must not
    assert(df.filter(col("is_current") && col("valid_to").isNotNull).count() === 0)
    assert(df.filter(!col("is_current") && col("valid_to").isNull).count() === 0)
    df.unpersist()
  }

  test("sample_stratified draws exactly min(20, group size) per segment") {
    val df = SparkEntry.queries("sample_stratified")(spark, sf).cache()
    val sizes = Tables.customer(spark, sf)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("g"))
    val got = df.groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val bad = got.join(sizes, "c_mktsegment")
      .filter(col("n") =!= least(lit(20L), col("g"))).count()
    assert(bad === 0)
    // determinism: same rows on a re-run
    val again = SparkEntry.queries("sample_stratified")(spark, sf)
    assert(df.exceptAll(again).count() === 0)
    df.unpersist()
  }

  test("doc_pack is a gapless token stream per shard") {
    val df = SparkEntry.queries("doc_pack")(spark, sf).cache()
    // offsets restart correctly: pack_id * 64 + pack_offset must equal the
    // running cumsum before each chunk — i.e. consecutive chunks tile the
    // stream with no token gaps or overlaps
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"), col("start"))
    val recon = df.withColumn("stream_pos", col("pack_id") * 64 + col("pack_offset"))
      .withColumn("prev_end",
        lag(col("stream_pos") + col("n_chunk_toks"), 1, 0).over(w))
    assert(recon.filter(col("stream_pos") =!= col("prev_end")).count() === 0)
    assert(df.filter(col("pack_offset") < 0 || col("pack_offset") >= 64).count() === 0)
    df.unpersist()
  }

  test("join_lateral returns at most 2 orders per customer, the top-priced ones") {
    val df = SparkEntry.queries("join_lateral")(spark, sf).cache()
    val perCust = df.groupBy("c_custkey").agg(count(lit(1)).as("n"))
    assert(perCust.filter(col("n") > 2).count() === 0)
    // cross-check against the window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val expected = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    assert(df.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(df).count() === 0)
    df.unpersist()
  }

  test("fn_trig inputs stay inside [0,1) away from singularities") {
    val df = SparkEntry.queries("fn_trig")(spark, sf)
    assert(df.filter(col("tan_x") < 0 || col("tan_x") > 1.5574078).count() === 0)
    assert(df.filter(col("hyp_x") < 1.0 || col("hyp_x") > 1.4142136).count() === 0)
  }

  test("fn_array2 positions and removals agree with direct recomputation") {
    val df = SparkEntry.queries("fn_array2")(spark, sf)
    val bad = df.join(
        Tables.documents(spark, sf).select(col("doc_id"),
          split(col("text"), " ").as("toks")), "doc_id")
      .filter(
        (col("spark_pos") > 0) =!= col("has_spark") ||
        col("n_no_the") > size(col("toks")))
    assert(bad.count() === 0)
  }

  test("fn_variant extraction agrees with get_json_object on the raw strings") {
    val df = SparkEntry.queries("fn_variant")(spark, sf).cache()
    assert(df.filter(!col("missing_is_null")).count() === 0)
    assert(df.filter(col("missing_val").isNotNull).count() === 0)
    val direct = Tables.events(spark, sf).select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("bigint").as("k_direct"))
    val bad = df.join(direct, "event_id")
      .filter(col("k_int") =!= col("k_direct") || col("nested_k") =!= col("k_direct"))
    assert(bad.count() === 0)
    df.unpersist()
  }

  test("agg_bitmap_distinct merged bitmap counts equal exact count distinct") {
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("join_dpp and scan_partition_prune read back exactly the selected partitions") {
    val pruned = SparkEntry.queries("scan_partition_prune")(spark, sf)
    assert(pruned.select(countDistinct(col("o_orderpriority"))).first().getLong(0) === 1)
    val dpp = SparkEntry.queries("join_dpp")(spark, sf).collect()
    assert(dpp.map(_.getString(0)).toSet === Set("1-URGENT", "2-HIGH"))
  }

  test("doc_tfidf keeps at most 3 terms per doc with descending scores") {
    val df = SparkEntry.queries("doc_tfidf")(spark, sf).cache()
    assert(df.groupBy("doc_id").count().filter(col("count") > 3).count() === 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("rnk"))
    val nonMono = df.withColumn("prev", lag(col("tfidf"), 1).over(w))
      .filter(col("prev").isNotNull && col("tfidf") > col("prev"))
    assert(nonMono.count() === 0)
    df.unpersist()
  }

  test("etl_dq_checks reports every audit with zero violations on the clean testdata") {
    val rows = SparkEntry.queries("etl_dq_checks")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === Set(
      "null_custkey", "nonpos_price", "future_orderdate", "dup_orderkey", "orphan_lineitem"))
    assert(rows.forall(_.getLong(1) === 0L), rows.mkString(","))
  }

  test("reshape_nested roundtrip equals the flat join it encodes") {
    val got = SparkEntry.queries("reshape_nested")(spark, sf)
    val want = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("l_linenumber"), col("l_quantity"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("win_time_range singleton frames equal their own value") {
    val df = SparkEntry.queries("win_time_range")(spark, sf)
    val lone = df.filter(col("trail_n") === 1)
      .join(Tables.events(spark, sf).select(col("event_id"), col("value")), "event_id")
      .filter(abs(col("trail_sum") - round(col("value"), 6)) > 1e-9)
    assert(lone.count() === 0)
  }

  test("dedup_components gives both endpoints of every pair one label, min-anchored") {
    val comp = SparkEntry.queries("dedup_components")(spark, sf).cache()
    assert(comp.filter(col("component_id") > col("doc_id")).count() === 0)
    val pairs = graft.api.DedupOps.nearJaccardPairsOnSets(
      graft.api.DedupOps.shingleSets(Tables.documents(spark, sf), "doc_id", "text", 2), 3, 5)
    val la = comp.select(col("doc_id").as("id_a"), col("component_id").as("c_a"))
    val lb = comp.select(col("doc_id").as("id_b"), col("component_id").as("c_b"))
    val split = pairs.join(la, "id_a").join(lb, "id_b")
      .filter(col("c_a") =!= col("c_b"))
    assert(split.count() === 0)
    // every component's anchor is a member of the component
    val anchors = comp.select(col("component_id").as("cid")).distinct()
      .join(comp, col("cid") === col("doc_id"), "left_anti")
    assert(anchors.count() === 0)
    comp.unpersist()
  }

  test("fn_tz conversions keep the Tokyo-NY offset at 13 or 14 hours") {
    val df = SparkEntry.queries("fn_tz")(spark, sf)
    val offs = df.select(
        ((unix_timestamp(col("tokyo_local")) - unix_timestamp(col("ny_local"))) / 3600).as("off"))
      .distinct().collect().map(_.getDouble(0)).toSet
    assert(offs.subsetOf(Set(13.0, 14.0)), offs)
    assert(df.filter(col("ny_hour") < 0 || col("ny_hour") > 23).count() === 0)
  }

  test("text_vocab_stats invariants: hapax <= vocab, share in (0,1]") {
    val r = SparkEntry.queries("text_vocab_stats")(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_hapax") <= row.getAs[Long]("vocab_size"))
    assert(row.getAs[Double]("top100_share") > 0 && row.getAs[Double]("top100_share") <= 1.0)
  }

  test("agg_approx_top_k returns exact counts for the 3 heaviest priorities") {
    val got = SparkEntry.queries("agg_approx_top_k")(spark, sf).collect()
    assert(got.length === 3)
    val exact = Tables.orders(spark, sf).groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n")).orderBy(desc("n"), col("o_orderpriority"))
      .limit(3).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap === exact)
  }

  test("stream_foreachbatch snapshot is idempotent across reruns") {
    val a = SparkEntry.queries("stream_foreachbatch")(spark, sf).collect()
    val b = SparkEntry.queries("stream_foreachbatch")(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("join_range_binned equals the theta-range join row set") {
    val binned = SparkEntry.queries("join_range_binned")(spark, sf)
    val theta = SparkEntry.queries("join_theta_range")(spark, sf)
    assert(binned.exceptAll(theta).count() === 0)
    assert(theta.exceptAll(binned).count() === 0)
  }

  test("win_ignore_nulls locf equals the last non-null running value") {
    val df = SparkEntry.queries("win_ignore_nulls")(spark, sf)
    // rows whose own v is non-null must have locf_v == o_totalprice
    val own = df.join(Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice")), "o_orderkey")
      .filter(col("o_orderkey") % 3 =!= 0)
      .filter(col("locf_v") =!= col("o_totalprice"))
    assert(own.count() === 0)
  }

  test("agg_string concatenates each region's nations sorted and complete") {
    val rows = SparkEntry.queries("agg_string")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === Tables.nation(spark, sf).count())
    rows.foreach { r =>
      val parts = r.getAs[String]("nations").split(",").toSeq
      assert(parts === parts.sorted)
      assert(parts.length === r.getAs[Long]("n"))
    }
  }

  test("dedup_norm groups cover every document exactly once") {
    val df = SparkEntry.queries("dedup_norm")(spark, sf)
    assert(df.agg(sum(col("n_copies"))).first().getLong(0) ===
      Tables.documents(spark, sf).count())
    assert(df.select(countDistinct(col("keep_id"))).first().getLong(0) === df.count())
  }

  test("scan_schema_merge fills the added column with nulls for old batches") {
    val df = SparkEntry.queries("scan_schema_merge")(spark, sf).cache()
    assert(df.count() === Tables.nation(spark, sf).count())
    assert(df.filter(col("n_nationkey") % 2 === 0 && col("n_regionkey").isNotNull).count() === 0)
    assert(df.filter(col("n_nationkey") % 2 === 1 && col("n_regionkey").isNull).count() === 0)
    df.unpersist()
  }

  test("stream_sliding puts every event in exactly two windows") {
    val df = SparkEntry.queries("stream_sliding")(spark, sf)
    assert(df.agg(sum(col("n"))).first().getLong(0) ===
      2L * Tables.events(spark, sf).count())
  }

  test("dedup_keep = all docs minus non-anchor component members") {
    val keep = SparkEntry.queries("dedup_keep")(spark, sf)
    val comp = SparkEntry.queries("dedup_components")(spark, sf).cache()
    val nonAnchor = comp.filter(col("component_id") =!= col("doc_id")).count()
    assert(keep.count() === Tables.documents(spark, sf).count() - nonAnchor)
    // every component anchor survives
    val lostAnchors = comp.filter(col("component_id") === col("doc_id"))
      .select(col("doc_id"))
      .join(keep.select(col("doc_id")), Seq("doc_id"), "left_anti")
    assert(lostAnchors.count() === 0)
    comp.unpersist()
  }

  test("agg_bool universal/existential flags hold on the data contract") {
    val rows = SparkEntry.queries("agg_bool")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("all_qty_pos"), "l_quantity domain is 1..50")
      assert(r.getAs[Boolean]("all_tax_le8"), "l_tax domain is 0.00..0.08")
    }
  }

  test("doc_bm25 scores exactly the docs containing a query term, all positive") {
    val df = SparkEntry.queries("doc_bm25")(spark, sf).cache()
    val expected = Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), "vector") ||
        array_contains(split(col("text"), " "), "stream") ||
        array_contains(split(col("text"), " "), "merge"))
      .count()
    assert(df.count() === expected, "one row per doc matching >= 1 query term")
    // Lucene idf is ln(1 + x) with x > 0, so every summed score is > 0,
    // and a doc can match at most the 3 query terms
    assert(df.filter(col("bm25") <= 0).count() === 0)
    assert(df.filter(col("n_terms") < 1 || col("n_terms") > 3).count() === 0)
    df.unpersist()
  }

  test("text_contamination flags benchmark near-dups and nothing it shouldn't") {
    val df = SparkEntry.queries("text_contamination")(spark, sf).cache()
    // no benchmark doc may appear as a contaminated corpus doc
    assert(df.filter(col("doc_id") % 19 === 0).count() === 0)
    // shared-shingle counts are bounded by the doc's own shingle count
    val shingleCounts = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .filter(col("n") >= 5)
      .select(col("doc_id"), (col("n") - 4).as("max_shingles"))
    val over = df.join(shingleCounts, "doc_id")
      .filter(col("n_shared_shingles") > col("max_shingles"))
    assert(over.count() === 0)
    assert(df.filter(col("n_bench_docs") < 1).count() === 0)
    df.unpersist()
  }

  test("text_repetition fractions are consistent and bounded") {
    val df = SparkEntry.queries("text_repetition")(spark, sf).cache()
    assert(df.count() ===
      Tables.documents(spark, sf)
        .filter(size(split(col("text"), " ")) >= 3).count())
    // dup fraction and top-gram share live in [0, 1); the top gram is
    // itself counted in the dup mass, so top_share-1/total <= dup_frac
    assert(df.filter(col("dup_gram_frac") < 0 || col("dup_gram_frac") >= 1).count() === 0)
    assert(df.filter(col("top_gram_share") <= 0 || col("top_gram_share") > 1).count() === 0)
    // both sides are 6dp-rounded, so allow one rounding step of jitter
    val bad = df.filter(
      col("top_gram_share") - lit(1.0) / col("total_grams") >
        col("dup_gram_frac") + lit(1.1e-6))
    assert(bad.count() === 0,
      "a gram repeated m times contributes m-1 repeats to the dup mass")
    df.unpersist()
  }

  test("domain_mix weights rebalance token shares to exactly uniform") {
    val rows = SparkEntry.queries("domain_mix")(spark, sf).collect()
    val k = rows.length
    assert(k > 1, "synthetic corpus has multiple sources")
    // share * weight == 1/k for every source (up to the 6dp rounding)
    rows.foreach { r =>
      val share = r.getAs[Double]("token_share")
      val w = r.getAs[Double]("sample_weight")
      assert(math.abs(share * w - 1.0 / k) < 1e-4,
        s"source ${r.getString(0)}: $share * $w != 1/$k")
    }
    // shares sum to ~1
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-4)
  }

  test("ts_interpolate is row-preserving and every repair sits inside its gap's bounds") {
    val df = SparkEntry.queries("ts_interpolate")(spark, sf).cache()
    val ev = Tables.events(spark, sf).cache()
    assert(df.count() === ev.count(), "interpolation is row-preserving")
    // observed (non-view) rows keep their own value verbatim
    val obs = ev.filter(col("event_type") =!= "view")
      .select(col("event_id"), round(col("value"), 6).as("want"))
    val kept = df.join(obs, "event_id")
      .filter(col("interp_v") =!= col("want"))
    assert(kept.count() === 0, "non-null observations must pass through unchanged")
    // every interpolated value lies within the user's observed min..max
    // (a convex combination can never escape the hull of its endpoints)
    val bounds = ev.filter(col("event_type") =!= "view")
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val escaped = df.filter(col("interp_v").isNotNull).join(bounds, "user_id")
      .filter(col("interp_v") < round(col("lo"), 6) - 1e-6 ||
        col("interp_v") > round(col("hi"), 6) + 1e-6)
    assert(escaped.count() === 0, "interpolations must stay inside the value hull")
    df.unpersist(); ev.unpersist()
  }

  test("ts_downsample buckets conserve row mass and order their OHLC values") {
    val df = SparkEntry.queries("ts_downsample")(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(df.agg(sum(col("n"))).head.getLong(0) === ev.count(),
      "every event lands in exactly one (user, day) bucket")
    val bad = df.filter(
      col("lo") > col("open_v") || col("lo") > col("close_v") ||
        col("hi") < col("open_v") || col("hi") < col("close_v") ||
        col("lo") > col("hi"))
    assert(bad.count() === 0, "lo <= open/close <= hi in every bucket")
    df.unpersist()
  }

  test("events_anomaly only flags days beyond 1.5 sample deviations") {
    val df = SparkEntry.queries("events_anomaly")(spark, sf).cache()
    assert(df.count() > 0, "the synthetic corpus has bursty days")
    assert(df.filter(abs(col("z")) < 1.5).count() === 0)
    // flagged rows must be genuine (user, day) count rows
    val daily = Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_want"))
    val mismatched = df.join(daily, Seq("user_id", "day"))
      .filter(col("n") =!= col("n_want"))
    assert(mismatched.count() === 0)
    df.unpersist()
  }

  test("events_paths returns the top-10 trigrams in deterministic order") {
    val rows = SparkEntry.queries("events_paths")(spark, sf).collect()
    assert(rows.length === 10)
    val counts = rows.map(_.getAs[Long]("n_paths"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts are non-increasing")
    assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("dedup_blocks covers exactly the 8-token-capable docs with fractions in [0,1]") {
    val df = SparkEntry.queries("dedup_blocks")(spark, sf).cache()
    val eligible = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 8)
    assert(df.count() === eligible.count())
    val bad = df.filter(col("n_dup_blocks") > col("n_blocks") ||
      col("dup_frac") < 0 || col("dup_frac") > 1 || col("n_blocks") <= 0)
    assert(bad.count() === 0)
    // block math: each doc has floor(n_tokens / 8) non-overlapping blocks
    val withWant = eligible
      .select(col("doc_id"),
        expr("size(split(text, ' ')) div 8").cast("long").as("want"))
    val wrong = df.join(withWant, "doc_id").filter(col("n_blocks") =!= col("want"))
    assert(wrong.count() === 0)
    df.unpersist()
  }

  test("join_asof_fwd picks strictly-future purchases inside the 7-day tolerance") {
    val df = SparkEntry.queries("join_asof_fwd")(spark, sf).cache()
    val nClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    assert(df.count() === nClicks, "forward as-of is left-row-preserving")
    val matched = df.filter(col("next_purchase_s").isNotNull)
    assert(matched.count() > 0)
    val bad = matched.filter(col("next_purchase_s") <= col("ts_s") ||
      col("next_purchase_s") > col("ts_s") + 7L * 24 * 3600)
    assert(bad.count() === 0, "every match is in (ts, ts + 7d]")
    df.unpersist()
  }

  test("agg_skew_kurt emits finite population moments per return flag") {
    val rows = SparkEntry.queries("agg_skew_kurt")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      Seq("skew_qty", "kurt_qty", "skew_price", "kurt_price").foreach { c =>
        val v = r.getAs[Double](c)
        assert(!v.isNaN && !v.isInfinite, s"$c must be finite")
      }
      // population excess kurtosis is bounded below by -2
      assert(r.getAs[Double]("kurt_qty") >= -2.0)
      assert(r.getAs[Double]("kurt_price") >= -2.0)
    }
  }

  test("etl_partition_overwrite replaces only the patched partition") {
    val df = SparkEntry.queries("etl_partition_overwrite")(spark, sf).cache()
    val base = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_want"),
        sum(Tables.dec2(col("o_totalprice"))).cast("double").as("total_want"))
    val joined = df.join(base, "o_orderpriority").cache()
    // row counts survive in every partition (overwrite replaced, not dropped)
    assert(joined.filter(col("n") =!= col("n_want")).count() === 0)
    // untouched partitions keep their totals bit-for-bit
    val drifted = joined.filter(col("o_orderpriority") =!= "1-URGENT" &&
      col("total") =!= col("total_want"))
    assert(drifted.count() === 0, "non-patched partitions must be preserved")
    // the patched partition carries exactly the doubled total
    val urgent = joined.filter(col("o_orderpriority") === "1-URGENT")
      .select((col("total") - col("total_want") * 2).as("dz")).head
    assert(math.abs(urgent.getDouble(0)) < 1e-6)
    joined.unpersist(); df.unpersist()
  }

  test("src_xml_roundtrip preserves every customer row and value") {
    val df = SparkEntry.queries("src_xml_roundtrip")(spark, sf)
    val want = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_mktsegment"))
    assert(df.count() === want.count())
    assert(df.exceptAll(want).count() === 0, "XML roundtrip must be lossless")
  }

  test("sink_zorder clustering tightens per-file key spans vs the unclustered layout") {
    // materialize the z-ordered sink (the query itself does the write)
    SparkEntry.queries("sink_zorder")(spark, sf).collect()
    val zdir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_rt/li_zorder")
    val zfiles = zdir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(zfiles.length > 1, "need multiple files for a clustering claim")
    def spanSum(paths: Seq[String], colName: String): Long =
      paths.map { p =>
        val r = spark.read.parquet(p)
          .agg(min(col(colName)).cast("long"), max(col(colName)).cast("long")).head
        r.getLong(1) - r.getLong(0)
      }.sum
    // unclustered baseline: total span of each file ~= full key domain
    val dom = Tables.lineitem(spark, sf)
      .agg((max(col("l_partkey")) - min(col("l_partkey"))).cast("long"),
        (max(col("l_suppkey")) - min(col("l_suppkey"))).cast("long")).head
    val (pDom, sDom) = (dom.getLong(0), dom.getLong(1))
    val n = zfiles.length.toLong
    // z-clustered files must jointly cover well under n x full-domain
    // on BOTH interleaved dimensions — that is what makes a 2-D box skip
    // (an unclustered write would put ~the full domain in every file)
    assert(spanSum(zfiles.toSeq, "l_partkey") * 10 < n * pDom * 8,
      "partkey spans must shrink under z-clustering")
    assert(spanSum(zfiles.toSeq, "l_suppkey") * 10 < n * sDom * 8,
      "suppkey spans must shrink under z-clustering")
  }

  test("src_text_roundtrip survives every document byte-for-byte in length") {
    val df = SparkEntry.queries("src_text_roundtrip")(spark, sf)
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_want"))
    assert(df.join(want, "doc_id").filter(col("n_chars_rt") =!= col("n_want"))
      .count() === 0)
    assert(df.count() === Tables.documents(spark, sf).count())
  }
}
