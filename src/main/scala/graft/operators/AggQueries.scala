package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.4 Aggregations. All float aggregates are rounded identically on the
  * Spark and DuckDB sides (money: 2dp, ratios: 6dp) and every query ends
  * in a total ORDER BY — the driver hash-compares results exactly.
  *
  * Scale: groupBy on low-cardinality keys is a two-phase hash aggregate
  * (partial map-side combine, then a tiny shuffle of pre-aggregated rows)
  * — the shuffle volume is O(groups×partitions), not O(rows), so this
  * shape survives 100 TB unchanged.
  */
object AggQueries {

  val queries: Map[String, Q] = Map(
    "agg_basic" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(Tables.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(Tables.dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(Tables.dec2(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "agg_global" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(Tables.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(avg(col("l_discount")), 6).as("avg_disc")
        )
    }),

    "agg_count_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")
        )
        .orderBy(col("l_returnflag"))
    }),

    "agg_grouping_sets" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("revenue", Tables.dec2(col("l_extendedprice")) *
          (lit(1) - col("l_discount").cast("decimal(4,2)")))
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), sum(col("revenue")).cast("double").as("revenue"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    "agg_rollup" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
      val nat = Tables.nation(s, dir)
      val reg = Tables.region(s, dir)
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping_id().as("gid"),
          sum(Tables.dec2(col("s_acctbal"))).cast("double").as("sum_bal"),
          count(lit(1)).as("n_supp"))
        .orderBy(col("gid"), col("r_name"), col("n_name"))
    }),

    "agg_cube" -> ((s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(Tables.dec2(col("o_totalprice"))).cast("double").as("sum_price"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    "agg_collect" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") <= 100)
        .groupBy(col("l_orderkey"))
        // array output serialized to CSV string: the driver's comparator
        // can't hash array cells (numpy unhashable), so both sides emit text
        .agg(array_join(sort_array(collect_list(col("l_partkey"))).cast("array<string>"), ",").as("partkeys"))
        .orderBy(col("l_orderkey"))
    }),

    "agg_stats" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_extendedprice")), 6).as("sd_price"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 6).as("cov_pq")
        )
        .orderBy(col("l_returnflag"))
    }),

    // Higher-moment statistics: population skewness and excess kurtosis
    // per group. Spark's skewness/kurtosis are single-pass MERGEABLE
    // moment aggregates (map-side partials combine by moment addition) —
    // the 100 TB path; the oracle recomputes them as explicit two-pass
    // central-moment SQL. 6dp round absorbs accumulation-order ulps.
    "agg_skew_kurt" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(skewness(col("l_quantity")), 6).as("skew_qty"),
          round(kurtosis(col("l_quantity")), 6).as("kurt_qty"),
          round(skewness(col("l_extendedprice")), 6).as("skew_price"),
          round(kurtosis(col("l_extendedprice")), 6).as("kurt_price"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_percentile" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price")
        )
        .orderBy(col("o_orderstatus"))
    }),

    // HLL++ approximate distinct. The raw estimate is engine-specific,
    // so the declared output is the exact count (oracle-checked) plus an
    // in-band boolean computed from the LIVE estimate (default rsd=5%):
    // estimator drift flips the row to false and fails the driver hash.
    "agg_approx_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("approx_in_band"))
    }),

    // Sketch percentiles (single-pass, mergeable — the 100 TB path where
    // exact percentile's full sort/collect is not). The raw sketch values
    // are engine-specific, so the DECLARED output is the oracle-able
    // part: the exact quantiles (cross-checked against DuckDB
    // quantile_cont) plus band-check booleans asserting the approx value
    // sits within 2% of the exact one (accuracy=1000 ⇒ rank error ≤
    // n/1000, far tighter than 2% on this data). The oracle emits TRUE
    // for the bands, so any sketch drift flips a row to false and fails
    // the hash — a graded check, not just a spec.
    "agg_approx_percentile" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("exact_median"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("exact_p90"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("am"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("ap"))
        .select(col("o_orderstatus"), col("exact_median"), col("exact_p90"),
          (abs(col("am") - col("exact_median")) <=
            greatest(abs(col("exact_median")) * 0.02, lit(1.0))).as("median_in_band"),
          (abs(col("ap") - col("exact_p90")) <=
            greatest(abs(col("exact_p90")) * 0.02, lit(1.0))).as("p90_in_band"))
        .orderBy(col("o_orderstatus"))
    }),

    "dedup_exact" -> ((s, dir) =>
      graft.api.DedupOps.exact(Tables.documents(s, dir), "text", "doc_id")
        .orderBy(col("doc_id")))
,
    // mergeable distinct-count sketches — the 100 TB dedup-accounting
    // shape: each frame (here: two halves of lineitem, in production two
    // days/shards) builds an HLL sketch INDEPENDENTLY, the binary
    // sketches union without touching the raw data, and the estimate
    // comes off the merged sketch. Sketch bytes/estimates are
    // engine-specific, so the declared output is the exact count
    // (oracle-checked) plus bound_ok computed from the LIVE merged
    // estimate (within 5% of exact — generous vs the lgK=12 ±~1.6%
    // band): a broken merge shows as a false row in the driver hash,
    // and SketchSpec asserts the tighter property.
    "sketch_hll_merge" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.filter(col("l_orderkey") % 2 === 0)
        .agg(hll_sketch_agg(col("l_partkey")).as("sk_a"))
      val b = li.filter(col("l_orderkey") % 2 === 1)
        .agg(hll_sketch_agg(col("l_partkey")).as("sk_b"))
      a.crossJoin(b)
        .select(hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("merged_est"))
        .crossJoin(li.agg(countDistinct(col("l_partkey")).as("exact_parts")))
        .select(col("exact_parts"),
          (abs(col("merged_est") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("bound_ok"))
    }),

    // mergeable EXACT distinct via roaring-style bitmaps: each
    // (group, bucket) builds a fixed-width bitmap of key positions,
    // partial bitmaps OR-merge associatively (demonstrated across an
    // even/odd split — the cross-frame accounting shape), and the final
    // count is a sum of per-bucket popcounts. Unlike count(DISTINCT) this
    // never re-shuffles raw keys to one reducer per group: work after the
    // first pass is O(buckets), not O(rows) — the 100 TB exact-distinct
    // pattern when HLL's approximation is not acceptable.
    "agg_bitmap_distinct" -> ((s, dir) => {
      val halves = Tables.lineitem(s, dir)
        .withColumn("half", pmod(col("l_orderkey"), lit(2)))
        .groupBy(col("l_returnflag"), col("half"),
          expr("bitmap_bucket_number(l_partkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
      halves.groupBy(col("l_returnflag"), col("bkt"))
        .agg(expr("bitmap_or_agg(bm)").as("bm2"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm2)")).cast("bigint").as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // approx_top_k heavy-hitters sketch (Spark 4): with distinct values
    // below the sketch capacity the estimates are EXACT, so the declared
    // query is oracle-checked against true counts; at 100 TB the same
    // one-pass mergeable sketch replaces the full groupBy+sort. Output is
    // re-sorted (est desc, item) so within-top-k sketch ordering ties
    // cannot flip rows; k=3's boundary (3003 vs 2996) is tie-free.
    "agg_approx_top_k" -> ((s, dir) => {
      Tables.orders(s, dir)
        .agg(expr("approx_top_k(o_orderpriority, 3)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("est"))
        .orderBy(desc("est"), col("item"))
    }),

    // grouping()/grouping_id() over rollup: the only way to tell a
    // subtotal row's NULL from a data NULL — required by any BI layer
    // consuming rollup output. Same single-shuffle expand as agg_rollup.
    "agg_grouping_id" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // ordered string aggregation (listagg/string_agg surface): collect +
    // in-group sort + join. The sort is per-group (array_sort of an
    // already-grouped list), not a global sort — grouped-concat stays one
    // shuffle at any scale; unbounded group sizes are the caller's risk,
    // same as in every engine.
    "agg_string" -> ((s, dir) => {
      Tables.nation(s, dir)
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    }),

    // deterministic mode: most frequent priority per status, ties broken
    // by priority string order (native mode() picks an arbitrary tie
    // winner — unusable under a hash-match oracle, so mode is derived
    // from count + row_number; same two-phase agg shape at scale)
    "agg_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("n"), asc("o_orderpriority"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // boolean aggregates: universal/existential predicates per group
    "agg_bool" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0).as("all_qty_pos"),
          bool_or(col("l_discount") > 0.09).as("any_disc_gt9"),
          bool_and(col("l_tax") <= 0.08).as("all_tax_le8"),
          count_if(col("l_discount") === 0.0).as("n_no_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // fixed-width-bucket histogram of order totals: floor division to the
    // bucket lower bound — a single two-phase hash agg, shuffle volume =
    // number of buckets (the scalable way to histogram 100 TB)
    // equi-DEPTH histogram (quartiles by row count, vs agg_histogram's
    // equi-width buckets): ntile over a fully-deterministic total order
    // (price, orderkey) so tie rows land in the same bucket in both
    // engines. One global sort — the optimizer's range-partitioned
    // TakeOrdered/Window path, same shape DuckDB uses; per-bucket
    // min/max/count follow as a bounded (4-row) aggregate.
    "agg_histogram_eqdepth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("q", ntile(4).over(w))
        .groupBy(col("q"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("q"))
    }),

    "agg_histogram" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("bucket_lo",
          (floor(col("o_totalprice") / 20000) * 20000).cast("bigint"))
        .groupBy(col("bucket_lo"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bucket_lo"))
    }),

    // argmax/argmin aggregation. Ties on price are broken by folding the
    // key into one exact int64 ordinal (price has ≤2dp; ordinal stays
    // under 2^53 so the arithmetic is exact in both engines).
    "agg_minmax_by" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("ord",
          (col("o_totalprice") * 100).cast("bigint") * 1000000 + col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(expr("max_by(o_orderkey, ord)").as("biggest_order"),
          expr("min_by(o_orderkey, ord)").as("smallest_order"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // top-k per group through the custom TypedImperativeAggregate
    // (functions/TopKAgg.scala): bounded min-heap buffer, partials of
    // exactly k doubles through the map-side combine — contrast with
    // collect_list+sort, which ships each group's FULL value set through
    // the shuffle. Result exploded to rows (rank, price) so the
    // comparator sees scalar cells.
    "agg_topk_heap" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(graft.functions.TopKDoubles.topK(col("o_totalprice"), 3).as("top3"))
        .select(col("o_orderstatus"), posexplode(col("top3")).as(Seq("pos", "price")))
        .select(col("o_orderstatus"), (col("pos") + 1).as("rnk"),
          round(col("price"), 2).as("price"))
        .orderBy(col("o_orderstatus"), col("rnk"))
    })
  )

  // agg_percentile carries both exact and approx medians on the Spark side;
  // approx_percentile with a huge accuracy equals exact on these data.
  val oracle: Map[String, String] = Map(
    // exact counts cross-checked for real; the band booleans are TRUE
    // literals — Spark computes them from its live sketches, so drift
    // shows up as a row-level hash mismatch
    "agg_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS approx_in_band FROM lineitem""".stripMargin,

    "sketch_hll_merge" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS bound_ok FROM lineitem""".stripMargin,

    // exact quantiles cross-checked for real; the band booleans are TRUE
    // literals here — Spark computes them from its live sketch, so a
    // drifted sketch shows up as a row-level hash mismatch
    "agg_approx_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS exact_median,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS exact_p90,
        |  TRUE AS median_in_band, TRUE AS p90_in_band
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS TINYINT) AS g_status,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "agg_string" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "agg_approx_top_k" ->
      """SELECT o_orderpriority AS item, count(*) AS est
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY est DESC, item LIMIT 3""".stripMargin,

    "agg_bitmap_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_basic" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_global" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price,
        |  round(avg(l_discount), 6) AS avg_disc
        |FROM lineitem""".stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, grouping(l_returnflag, l_linestatus) AS gid,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, grouping(r_name, n_name) AS gid,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal, count(*) AS n_supp
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name, n_name""".stripMargin,

    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, grouping(o_orderstatus, o_orderpriority) AS gid,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "agg_collect" ->
      """SELECT l_orderkey, array_to_string(list(l_partkey ORDER BY l_partkey), ',') AS partkeys
        |FROM lineitem WHERE l_orderkey <= 100
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 6) AS sd_price,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        |  round(covar_samp(l_extendedprice, l_quantity), 6) AS cov_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_skew_kurt" ->
      """WITH mu AS (
        |  SELECT l_returnflag, avg(l_quantity) AS mq, avg(l_extendedprice) AS mp
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  round(avg(pow(l_quantity - mq, 3))
        |    / pow(avg(pow(l_quantity - mq, 2)), 1.5), 6) AS skew_qty,
        |  round(avg(pow(l_quantity - mq, 4))
        |    / pow(avg(pow(l_quantity - mq, 2)), 2) - 3, 6) AS kurt_qty,
        |  round(avg(pow(l_extendedprice - mp, 3))
        |    / pow(avg(pow(l_extendedprice - mp, 2)), 1.5), 6) AS skew_price,
        |  round(avg(pow(l_extendedprice - mp, 4))
        |    / pow(avg(pow(l_extendedprice - mp, 2)), 2) - 3, 6) AS kurt_price
        |FROM lineitem l JOIN mu USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,

    "agg_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority),
        |r AS (
        |  SELECT o_orderstatus, o_orderpriority, n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY n DESC, o_orderpriority) AS rn
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "agg_bool" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_qty_pos,
        |  bool_or(l_discount > 0.09) AS any_disc_gt9,
        |  bool_and(l_tax <= 0.08) AS all_tax_le8,
        |  CAST(count_if(l_discount = 0.0) AS BIGINT) AS n_no_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_histogram_eqdepth" ->
      """SELECT q, count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM (SELECT o_totalprice,
        |        ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q
        |      FROM orders)
        |GROUP BY q ORDER BY q""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 20000) * 20000 AS BIGINT) AS bucket_lo,
        |  count(*) AS n,
        |  round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket_lo""".stripMargin,

    "agg_minmax_by" ->
      """SELECT o_orderstatus,
        |  arg_max(o_orderkey, ord) AS biggest_order,
        |  arg_min(o_orderkey, ord) AS smallest_order,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM (SELECT *, CAST(o_totalprice * 100 AS BIGINT) * 1000000 + o_orderkey AS ord
        |      FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // values-only output makes boundary ties harmless: row_number order
    // among equal prices is arbitrary but the emitted prices are equal
    "agg_topk_heap" ->
      """SELECT o_orderstatus, CAST(rnk AS INT) AS rnk, round(price, 2) AS price
        |FROM (SELECT o_orderstatus, o_totalprice AS price,
        |        row_number() OVER (PARTITION BY o_orderstatus
        |                           ORDER BY o_totalprice DESC) AS rnk
        |      FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_orderstatus, rnk""".stripMargin
  )
}
