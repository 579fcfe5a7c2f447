package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 operator pack: regression/correlation aggregates (grouped,
  * global-matrix, rolling), discrete percentiles, native listagg,
  * Count-Min sketch report, EWMA, running-distinct / rolling-median
  * windows, null-safe and hint-forced joins, interval / AES / printf /
  * collation / try_* / map-HOF / JSON / generator function packs,
  * Gopher quality rules, and the temp-view SQL path.
  *
  * Scale notes:
  * - agg_regression: regr_* are single-pass mergeable co-moment
  *   aggregates (partial+final hash agg) — the same two-phase shape as
  *   agg_stats; nothing changes at 100 TB.
  * - fn_interval / fn_aes: pure projection (codegen row-local work, no
  *   shuffle). AES-ECB is deterministic per (key, plaintext), which is
  *   what makes the roundtrip oracle-able; for storage encryption at
  *   rest you'd use GCM (random IV) and give up value-equality — the
  *   declared query documents the trade by checking the roundtrip, not
  *   the ciphertext bytes.
  * - win_running_distinct: the "distinct count so far" rewrite — a
  *   first-occurrence flag (one keyed window) followed by a running
  *   count (second keyed window). Spark does not support DISTINCT
  *   aggregates in window frames at any scale; this two-window plan is
  *   the standard O(n log n)-per-partition formulation. The two windows
  *   partition on (user, type) then (user) — the second sort reuses the
  *   (user)-hash Exchange only when partitioning is compatible, so the
  *   plan pays at most two Exchanges of the event frame, never a
  *   per-row distinct scan.
  */
object Ext6Queries {

  private def regrCols = Seq(
    count(lit(1)).as("n"),
    round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("r"),
    round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
    round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("icept"),
    round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"))

  val queries: Map[String, Q] = Map(
    // least-squares fit of extendedprice on quantity per returnflag:
    // regr_count/slope/intercept/r2 + corr, all mergeable co-moment
    // aggregates computed in one pass
    "agg_regression" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(regrCols.head, regrCols.tail: _*)
        .orderBy(col("l_returnflag"))
    }),

    // calendar vs fixed-length interval arithmetic on timestamps:
    // year-month intervals clamp day-of-month, day-time intervals are
    // exact µs shifts, and a column-driven make_dt_interval exercises
    // dynamic interval construction
    "fn_interval" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 MONTHS")).as("plus_3mo"),
          (col("o_orderdate") + expr("INTERVAL 100 DAYS")).as("plus_100d"),
          (col("o_orderdate") - expr("INTERVAL 36 HOURS")).as("minus_36h"),
          (col("o_orderdate") - expr("INTERVAL 2 MONTHS")).as("back_2mo"),
          (col("o_orderdate") + make_dt_interval((col("o_orderkey") % 30).cast("int")))
            .as("plus_var"),
          (datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")) * 24
            + hour(col("o_orderdate"))).as("hours_since"))
        .orderBy(col("o_orderkey"))
    }),

    // AES-ECB encrypt→decrypt roundtrip per row; ciphertext length is
    // the PKCS7 envelope (16·(⌊len/16⌋+1)) so the oracle reproduces it
    // arithmetically without running AES
    "fn_aes" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name").as("orig"))
        .withColumn("cipher", expr("aes_encrypt(cast(orig AS BINARY), '0123456789abcdef', 'ECB')"))
        .select(col("c_custkey"), col("orig"),
          length(col("cipher")).as("cipher_len"),
          expr("cast(aes_decrypt(cipher, '0123456789abcdef', 'ECB') AS STRING)").as("roundtrip"))
        .withColumn("match_ok", col("roundtrip") === col("orig"))
        .orderBy(col("c_custkey"))
    }),

    // generator null semantics: posexplode_outer keeps a (null, null)
    // row for NULL and EMPTY arrays where plain explode would drop the
    // parent — the left-preserving flatten every nested-ingest pipeline
    // needs (a dropped parent row is silent data loss at scale)
    "fn_generators" -> ((s, dir) => {
      val base = Tables.customer(s, dir).select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, array().cast("array<int>"))
          .when(col("c_custkey") % 3 === 1, lit(null).cast("array<int>"))
          .otherwise(array((col("c_custkey") % 5).cast("int"),
            (col("c_custkey") % 7).cast("int"))).as("arr"))
      base.select(col("c_custkey"), posexplode_outer(col("arr")).as(Seq("pos", "v")))
        .orderBy(col("c_custkey"), col("pos"))
    }),

    // pairwise correlation matrix of the four lineitem measures in ONE
    // single-pass aggregate (6 co-moment pairs share the scan)
    "agg_corr_matrix" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      def r(a: String, b: String) =
        round(corr(col(a), col(b)), 6).as(s"r_${a.drop(2)}_${b.drop(2)}")
      li.agg(
        r("l_quantity", "l_extendedprice"),
        r("l_quantity", "l_discount"),
        r("l_quantity", "l_tax"),
        r("l_extendedprice", "l_discount"),
        r("l_extendedprice", "l_tax"),
        r("l_discount", "l_tax"))
    }),

    // printf-style formatting (format_string ↔ DuckDB printf): padded
    // floats, hex keys, left-justified fields — the C-style subset both
    // engines implement identically
    "fn_format" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          format_string("key=%d", col("p_partkey")).as("kv"),
          format_string("%012.2f", col("p_retailprice")).as("padded"),
          format_string("%x", col("p_partkey")).as("hexkey"),
          format_string("[%-12s]", col("p_brand")).as("left_just"),
          format_string("%s/%05d", col("p_type"), col("p_size")).as("type_size"))
        .orderBy(col("p_partkey"))
    }),

    // truncated-kernel EWMA (α=0.5, 8 taps) over each user's daily value
    // series: the IIR recurrence is re-expressed as a FINITE weighted
    // window (weights 0.5^j decay below 1% after 8 taps), because the
    // exact recurrence is a sequential scan that cannot partition — the
    // truncated kernel is embarrassingly parallel per key and its lag
    // terms all ride ONE keyed window sort. Weights are exact powers of
    // two and terms sum in fixed expression order, so the arithmetic is
    // bit-identical across engines; daily sums pre-round to 9dp.
    "ts_ewma" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 9).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val lags = (1 until 8).map(j => (lag(col("v"), j).over(w), math.pow(0.5, j)))
      val num = lags.foldLeft(col("v")) { case (acc, (l, wj)) =>
        acc + coalesce(l, lit(0.0)) * lit(wj) }
      val den = lags.foldLeft(lit(1.0)) { case (acc, (l, wj)) =>
        acc + when(l.isNotNull, lit(wj)).otherwise(lit(0.0)) }
      daily.withColumn("ewma", round(num / den, 6))
        .select(col("user_id"), col("day"), col("v"), col("ewma"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Count-Min frequency sketch: one sketch per disjoint half of the
    // event stream, merged ELEMENTWISE (zip_with +) without rescanning
    // raw data, then point-estimated for every event type. Declared
    // output = invariant report: exact per-type counts (SQL) + the CMS
    // guarantee booleans (est ≥ exact always; est ≤ exact + ε·N). The
    // estimate UDF runs over |event types| rows, never the fact stream.
    "sketch_cms" -> ((s, dir) => {
      import graft.functions.{CountMinLongs, CountMinSketchOps}
      val d = 4; val w = 256
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), xxhash64(col("event_type")).as("k"))
      val halves = ev.withColumn("half", (col("event_id") % 2).cast("int"))
        .groupBy(col("half"))
        .agg(CountMinLongs.countMin(col("k"), d, w).as("sk"))
      val merged = halves.filter(col("half") === 0).select(col("sk").as("sk0"))
        .crossJoin(halves.filter(col("half") === 1).select(col("sk").as("sk1")))
        .select(zip_with(col("sk0"), col("sk1"), (x, y) => x + y).as("sk"))
      val est = udf((sk: Seq[Long], key: Long) => CountMinSketchOps.estimate(sk, key, d, w))
      val exact = ev.groupBy(col("event_type"), col("k")).agg(count(lit(1)).as("n_exact"))
      val totals = exact.agg(sum(col("n_exact")).as("total_n"))
      exact.crossJoin(broadcast(merged)).crossJoin(broadcast(totals))
        .withColumn("cms_est", est(col("sk"), col("k")))
        .select(col("event_type"), col("n_exact"),
          (col("cms_est") >= col("n_exact") &&
            col("cms_est") <= col("n_exact")
              + ceil(lit(math.E / w) * col("total_n")).cast("long")).as("cms_ok"))
        .orderBy(col("event_type"))
    }),

    // collation-aware string semantics (Spark 4 UTF8_LCASE): equality,
    // contains, and prefix match are case-insensitive under the collated
    // comparison while the stored value keeps its original case — vs the
    // lower()-normalizing oracle formulation
    "fn_collation" -> ((s, dir) => {
      Tables.customer(s, dir)
        .withColumn("m",
          expr("""CASE CAST(c_custkey % 3 AS INT)
                 |  WHEN 0 THEN upper(c_mktsegment)
                 |  WHEN 1 THEN lower(c_mktsegment)
                 |  ELSE concat(upper(substring(c_mktsegment, 1, 3)),
                 |              lower(substring(c_mktsegment, 4)))
                 |END""".stripMargin))
        .select(col("c_custkey"), col("m"),
          expr("collate(m, 'UTF8_LCASE') = collate('building', 'UTF8_LCASE')")
            .as("is_building"),
          expr("contains(collate(m, 'UTF8_LCASE'), collate('ING', 'UTF8_LCASE'))")
            .as("has_ing"),
          expr("startswith(collate(m, 'UTF8_LCASE'), collate('bUiL', 'UTF8_LCASE'))")
            .as("starts_buil"))
        .orderBy(col("c_custkey"))
    }),

    // native ordered listagg (Spark 4.0 WITHIN GROUP) — the SQL-standard
    // spelling of agg_string's collect+sort+join; one shuffle, ordered
    // deterministically inside the aggregate
    "agg_listagg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 100 === 0)
        .groupBy(col("o_orderstatus"))
        .agg(expr("listagg(o_orderpriority, '|') WITHIN GROUP " +
          "(ORDER BY o_orderpriority, o_orderkey)").as("prios"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // discrete (no-interpolation) percentiles: percentile_disc WITHIN
    // GROUP picks an actual data value — the right quantile for prices
    // and latencies where an interpolated value never occurred
    "agg_percentile_disc" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    }),

    // JSON construction + navigation roundtrip: each engine builds its
    // OWN json string and extracts from it (raw json never crosses the
    // compare, so float-rendering differences can't bite — money rides
    // as integer cents)
    "fn_json2" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("j", to_json(struct(
          col("o_orderkey").as("k"),
          (Tables.dec2(col("o_totalprice")) * 100).cast("long").as("cents"),
          array(col("o_orderstatus"), col("o_orderpriority")).as("tags"))))
        .select(col("o_orderkey"),
          get_json_object(col("j"), "$.cents").cast("long").as("cents"),
          get_json_object(col("j"), "$.tags[1]").as("tag2"),
          json_array_length(get_json_object(col("j"), "$.tags")).as("n_tags"))
        .orderBy(col("o_orderkey"))
    }),

    // explicit SHUFFLE_HASH join hint: skip the sort phase of SMJ when
    // one side comfortably hash-builds per partition — the hint surface
    // an operator who knows their data uses (plan-asserted in PlanSpec)
    "join_hint_shj" -> ((s, dir) => {
      Tables.lineitem(s, dir).hint("SHUFFLE_HASH")
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(Tables.dec2(col("l_extendedprice"))).cast("double").as("gross"))
        .orderBy(col("o_orderpriority"))
    }),

    // map higher-order functions: map_zip_with / transform_keys /
    // transform_values / map_filter / map_concat — all codegen-eligible
    // lambdas; outputs are element_at scalars so the oracle reproduces
    // them without MAP literals (engine map syntaxes differ)
    "fn_map2" -> ((s, dir) => {
      Tables.customer(s, dir)
        .withColumn("m1", map(lit("bal"), col("c_acctbal"), lit("key"),
          col("c_custkey").cast("double")))
        .withColumn("m2", map(lit("bal"), lit(100.0), lit("key"), lit(2.0)))
        .select(col("c_custkey"),
          round(element_at(expr("map_zip_with(m1, m2, (k, a, b) -> a + b)"), "bal"), 2)
            .as("zipped_bal"),
          element_at(expr("transform_values(m1, (k, v) -> v * 2)"), "key").as("doubled_key"),
          element_at(expr("transform_keys(m1, (k, v) -> upper(k))"), "BAL").as("upper_bal"),
          size(expr("map_filter(m1, (k, v) -> v > 0)")).as("n_positive"),
          size(expr("map_concat(m1, map('extra', 1.0D))")).as("n_concat"))
        .orderBy(col("c_custkey"))
    }),

    // pivot with MULTIPLE aggregates per pivot value (count + sum column
    // explosion) — one expand+hash-agg pass, domain pinned so no extra
    // distinct job runs at any scale
    "reshape_pivot_multi" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("l_quantity"))).cast("double").as("qty"))
        .select(col("l_linestatus"),
          col("A_n").as("a_n"), col("A_qty").as("a_qty"),
          col("N_n").as("n_n"), col("N_qty").as("n_qty"),
          col("R_n").as("r_n"), col("R_qty").as("r_qty"))
        .orderBy(col("l_linestatus"))
    }),

    // catalog surface: temp views + pure-SQL multi-view join through
    // spark.sql — the notebook/BI entry path over the same engine
    "sql_temp_view" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("v_orders_e6")
      Tables.customer(s, dir).createOrReplaceTempView("v_customer_e6")
      s.sql("""SELECT c.c_mktsegment, count(*) AS n_orders,
              |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              |FROM v_orders_e6 o JOIN v_customer_e6 c ON o.o_custkey = c.c_custkey
              |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
    }),

    // rolling median (trailing 5 rows) of order totalprice per customer
    // — median() itself cannot take a frame in Spark, but the exact
    // percentile(x, 0.5) aggregate can: the robust-stats companion to
    // the rolling mean, one keyed window sort like any moving agg
    "win_rolling_median" -> ((s, dir) => {
      val wRn = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRoll = wRn.rowsBetween(-4, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("rn", row_number().over(wRn))
        .withColumn("roll_med",
          round(percentile(col("o_totalprice"), lit(0.5)).over(wRoll), 2))
        // full frames only: an odd (5-element) window's median is an
        // exact data point — even-count frames interpolate, and the two
        // engines' a+(b-a)/2 vs (a+b)/2 differ in the last ulp right at
        // a cent boundary (observed at sf0.001)
        .filter(col("rn") >= 5)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"), col("roll_med"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // null-safe equality join (<=>): NULL keys match each other instead
    // of vanishing — the dimension-join behavior "unknown bucket" rows
    // need; both sides pre-aggregate so the join is group-sized
    "join_null_safe" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .groupBy(nullif(col("user_id") % 7, lit(0)).as("k"))
        .agg(count(lit(1)).as("n_events"))
      val cu = Tables.customer(s, dir)
        .groupBy(nullif(col("c_custkey") % 7, lit(0)).as("k"))
        .agg(count(lit(1)).as("n_cust"))
      ev.join(cu, ev("k") <=> cu("k"), "full_outer")
        .select(coalesce(ev("k"), cu("k")).as("k_val"),
          (ev("k").isNull && cu("k").isNull).as("is_null_bucket"),
          col("n_events"), col("n_cust"))
        .orderBy(col("is_null_bucket"), col("k_val"))
    }),

    // rolling least-squares slope (trailing 5 rows) of order totalprice
    // per customer — regr_* aggregates are frame-able window functions,
    // so the rolling beta costs one keyed window sort like any moving
    // agg. x is the in-partition row index (strictly increasing ⇒
    // nonzero variance ⇒ no NULL-slope edge cases to diverge on).
    "win_rolling_regr" -> ((s, dir) => {
      val wRn = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wRoll = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-4, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .withColumn("rn", row_number().over(wRn))
        .withColumn("roll_slope",
          round(regr_slope(col("o_totalprice"), col("rn")).over(wRoll), 6))
        .withColumn("roll_n", count(lit(1)).over(wRoll))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"),
          col("roll_slope"), col("roll_n"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Gopher-style quality gate: word count / mean word length / symbol
    // ratio / stopword fraction rules in one codegen projection — each
    // signal is row-local string arithmetic, the whole filter is one
    // scan with zero shuffles at any corpus size
    "text_gopher_rules" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val words = split(col("text"), " ")
      val nWords = size(words)
      val meanLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
      val symRatio = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))
        .cast("double") / nWords
      val stopFrac = size(filter(split(lower(col("text")), " "),
        w => w.isin("the", "of", "and", "to", "a", "in", "is"))).cast("double") / nWords
      docs.select(col("doc_id"),
          nWords.as("n_words"),
          round(meanLen, 6).as("mean_word_len"),
          round(symRatio, 6).as("symbol_ratio"),
          round(stopFrac, 6).as("stopword_frac"))
        .withColumn("keep",
          col("n_words") >= 30 &&
          col("mean_word_len").between(3.8, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("stopword_frac") > 0.02)
        .orderBy(col("doc_id"))
    }),

    // error-safe arithmetic: try_divide/try_add/try_element_at return
    // NULL where ANSI mode would throw — the poison-row guard for
    // arithmetic, the way PERMISSIVE is for parsing
    "fn_try" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(try_divide(col("l_extendedprice"),
            (col("l_linenumber") - 3).cast("double")), 6).as("div_guarded"),
          try_add(lit(Long.MaxValue), col("l_orderkey")).as("add_ovf"),
          try_element_at(split(col("l_returnflag"), ""), lit(99)).as("elem_oob"),
          expr("try_cast(l_returnflag AS INT)").as("cast_bad"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // running distinct-event-type count per user over event time
    "win_running_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("fs", when(row_number().over(wFirst) === 1, lit(1)))
        .withColumn("n_distinct_types", count(col("fs")).over(wRun))
        .select(col("user_id"), col("event_id"), col("n_distinct_types"))
        .orderBy(col("user_id"), col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "agg_regression" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(corr(l_extendedprice, l_quantity), 6) AS r,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "fn_interval" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
        |  o_orderdate + INTERVAL 100 DAY AS plus_100d,
        |  o_orderdate - INTERVAL 36 HOUR AS minus_36h,
        |  o_orderdate - INTERVAL 2 MONTH AS back_2mo,
        |  o_orderdate + to_days(CAST(o_orderkey % 30 AS INTEGER)) AS plus_var,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) * 24
        |    + hour(o_orderdate) AS INTEGER) AS hours_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_aes" ->
      """SELECT c_custkey, c_name AS orig,
        |  CAST((length(c_name) // 16 + 1) * 16 AS INTEGER) AS cipher_len,
        |  c_name AS roundtrip, true AS match_ok
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "agg_listagg" ->
      """SELECT o_orderstatus,
        |  string_agg(o_orderpriority, '|'
        |    ORDER BY o_orderpriority, o_orderkey) AS prios,
        |  count(*) AS n
        |FROM orders WHERE o_orderkey % 100 = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_percentile_disc" ->
      """SELECT o_orderstatus,
        |  quantile_disc(o_totalprice, 0.5) AS p50,
        |  quantile_disc(o_totalprice, 0.9) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "fn_json2" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |  o_orderpriority AS tag2,
        |  CAST(2 AS INTEGER) AS n_tags
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "join_hint_shj" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "fn_map2" ->
      """SELECT c_custkey,
        |  round(c_acctbal + 100.0, 2) AS zipped_bal,
        |  CAST(c_custkey AS DOUBLE) * 2 AS doubled_key,
        |  c_acctbal AS upper_bal,
        |  CAST((CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
        |     + (CASE WHEN c_custkey > 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_positive,
        |  CAST(3 AS INTEGER) AS n_concat
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "reshape_pivot_multi" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (l_returnflag = 'A') AS a_n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag = 'A') AS DOUBLE) AS a_qty,
        |  count(*) FILTER (l_returnflag = 'N') AS n_n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag = 'N') AS DOUBLE) AS n_qty,
        |  count(*) FILTER (l_returnflag = 'R') AS r_n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) FILTER (l_returnflag = 'R') AS DOUBLE) AS r_qty
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "sql_temp_view" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin,

    "win_rolling_median" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, rn,
        |    round(quantile_cont(o_totalprice, 0.5) OVER w, 2) AS roll_med
        |  FROM r WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |WHERE rn >= 5 ORDER BY o_custkey, rn""".stripMargin,

    "join_null_safe" ->
      """WITH e AS (
        |  SELECT nullif(user_id % 7, 0) AS k, count(*) AS n_events
        |  FROM events GROUP BY nullif(user_id % 7, 0)),
        |c AS (
        |  SELECT nullif(c_custkey % 7, 0) AS k, count(*) AS n_cust
        |  FROM customer GROUP BY nullif(c_custkey % 7, 0))
        |SELECT coalesce(e.k, c.k) AS k_val,
        |  (e.k IS NULL AND c.k IS NULL) AS is_null_bucket,
        |  n_events, n_cust
        |FROM e FULL JOIN c ON e.k IS NOT DISTINCT FROM c.k
        |ORDER BY is_null_bucket, k_val""".stripMargin,

    "win_rolling_regr" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, rn,
        |  round(regr_slope(o_totalprice, rn) OVER w, 6) AS roll_slope,
        |  count(*) OVER w AS roll_n
        |FROM r WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, rn""".stripMargin,

    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / len(string_split(text, ' ')), 6) AS mean_word_len,
        |    round(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |      / len(string_split(text, ' ')), 6) AS symbol_ratio,
        |    round(CAST(len(list_filter(string_split(lower(text), ' '),
        |        w -> w IN ('the','of','and','to','a','in','is'))) AS DOUBLE)
        |      / len(string_split(text, ' ')), 6) AS stopword_frac
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS INTEGER) AS n_words, mean_word_len,
        |  symbol_ratio, stopword_frac,
        |  (n_words >= 30 AND mean_word_len BETWEEN 3.8 AND 10.0
        |    AND symbol_ratio <= 0.1 AND stopword_frac > 0.02) AS keep
        |FROM t ORDER BY doc_id""".stripMargin,

    "fn_try" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_linenumber = 3 THEN NULL
        |       ELSE round(l_extendedprice / (l_linenumber - 3), 6) END AS div_guarded,
        |  CASE WHEN l_orderkey > 0 THEN NULL
        |       ELSE 9223372036854775807 + l_orderkey END AS add_ovf,
        |  CAST(NULL AS VARCHAR) AS elem_oob,
        |  TRY_CAST(l_returnflag AS INTEGER) AS cast_bad
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "fn_generators" ->
      """WITH b AS (
        |  SELECT c_custkey,
        |    CASE CAST(c_custkey % 3 AS INTEGER)
        |      WHEN 0 THEN []::INTEGER[]
        |      WHEN 1 THEN NULL
        |      ELSE [CAST(c_custkey % 5 AS INTEGER), CAST(c_custkey % 7 AS INTEGER)]
        |    END AS arr
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT c_custkey, unnest(
        |    CASE WHEN arr IS NULL OR len(arr) = 0
        |      THEN [{'pos': CAST(NULL AS INTEGER), 'v': CAST(NULL AS INTEGER)}]
        |      ELSE list_transform(range(len(arr)),
        |        i -> {'pos': CAST(i AS INTEGER), 'v': arr[i + 1]}) END,
        |    recursive := true)
        |  FROM b)
        |ORDER BY c_custkey, pos""".stripMargin,

    "agg_corr_matrix" ->
      """SELECT
        |  round(corr(l_quantity, l_extendedprice), 6) AS r_quantity_extendedprice,
        |  round(corr(l_quantity, l_discount), 6) AS r_quantity_discount,
        |  round(corr(l_quantity, l_tax), 6) AS r_quantity_tax,
        |  round(corr(l_extendedprice, l_discount), 6) AS r_extendedprice_discount,
        |  round(corr(l_extendedprice, l_tax), 6) AS r_extendedprice_tax,
        |  round(corr(l_discount, l_tax), 6) AS r_discount_tax
        |FROM lineitem""".stripMargin,

    "fn_format" ->
      """SELECT p_partkey,
        |  printf('key=%d', p_partkey) AS kv,
        |  printf('%012.2f', p_retailprice) AS padded,
        |  printf('%x', p_partkey) AS hexkey,
        |  printf('[%-12s]', p_brand) AS left_just,
        |  printf('%s/%05d', p_type, p_size) AS type_size
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ts_ewma" -> {
      val num = (1 until 8).map(j =>
        s" + coalesce(lag(v, $j) OVER w, 0) * ${math.pow(0.5, j)}").mkString
      val den = (1 until 8).map(j =>
        s" + CASE WHEN lag(v, $j) OVER w IS NOT NULL THEN ${math.pow(0.5, j)} ELSE 0.0 END")
        .mkString
      s"""WITH d AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 9) AS v
         |  FROM events GROUP BY user_id, CAST(ts AS DATE))
         |SELECT user_id, day, v,
         |  round((v$num) / (1.0$den), 6) AS ewma
         |FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)
         |ORDER BY user_id, day""".stripMargin
    },

    "sketch_cms" ->
      """SELECT event_type, count(*) AS n_exact, true AS cms_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "fn_collation" ->
      """WITH v AS (
        |  SELECT c_custkey,
        |    CASE CAST(c_custkey % 3 AS INTEGER)
        |      WHEN 0 THEN upper(c_mktsegment)
        |      WHEN 1 THEN lower(c_mktsegment)
        |      ELSE concat(upper(substring(c_mktsegment, 1, 3)),
        |                  lower(substring(c_mktsegment, 4)))
        |    END AS m
        |  FROM customer)
        |SELECT c_custkey, m,
        |  lower(m) = 'building' AS is_building,
        |  contains(lower(m), 'ing') AS has_ing,
        |  starts_with(lower(m), 'buil') AS starts_buil
        |FROM v ORDER BY c_custkey""".stripMargin,

    "win_running_distinct" ->
      """WITH f AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
        |    THEN 1 END AS fs
        |  FROM events)
        |SELECT user_id, event_id,
        |  count(fs) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_distinct_types
        |FROM f ORDER BY user_id, event_id""".stripMargin
  )
}
