package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Completeness odds-and-ends: deterministic sampling/splitting, right
  * outer join, offset pagination, and null-handling (na.fill/drop).
  *
  * sample_hash is the training-pipeline way to sample/split: a portable
  * content hash (md5 — identical across engines) on the key, so the same
  * row lands in the same split everywhere, forever — unlike rand()
  * sampling, it's reproducible, join-stable, and needs no state.
  */
object MiscQueries {

  val queries: Map[String, Q] = Map(
    "sample_hash" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("h", substring(md5(col("o_orderkey").cast("string")), 1, 2))
        .withColumn("split",
          when(col("h") < "1a", "val").otherwise("train"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"))
    }),

    // stratified deterministic sampling: exactly 20 customers per market
    // segment, chosen by content-hash order — balanced class sampling
    // that is reproducible and join-stable (same rows selected on every
    // engine and every run, unlike rand()-based sampling). One window
    // pass; at scale the md5 order costs nothing extra over the shuffle
    // the partitioning already pays.
    "sample_stratified" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      Tables.customer(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("c_mktsegment"), col("c_custkey"), col("rn"))
        .orderBy(col("c_mktsegment"), col("rn"))
    }),

    "join_right_outer" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          sum(Tables.dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("c_custkey"))
    }),

    "topk_paged" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .offset(10).limit(20)
    }),

    // per-key top-k through the custom operator ladder: the query is the
    // IDIOMATIC rank-filter (row_number over user_id, keep <= 3) — the
    // injected RewriteRankFilterToTopK rule swaps the Exchange→Sort→
    // Window→Filter plan for the two-phase bounded-heap
    // TopKPerKeyExec (map-side partial before the shuffle, rank-emitting
    // final after), so the exchange moves <= 3·|users per partition| rows
    // instead of every event. PlanSpec pins the physical shape; the
    // oracle is the plain SQL rank filter. (value DESC, event_id) is a
    // total order, so ranks are engine-stable.
    "topk_per_key" -> ((s, dir) => {
      // child session (own ExperimentalMethods — newSession does NOT
      // inherit them) so the rank-filter rewrite is scoped to THIS
      // query and cannot retarget other declared queries' window plans
      // mid-Verify; same scoping discipline as StatsQueries.cboSession
      val cs = s.newSession()
      graft.plans.TopKPerKey.install(cs)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("value"), col("event_id"))
      Tables.events(cs, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy(col("user_id"), col("rnk"))
    }),

    "fn_na" -> ((s, dir) => {
      // manufacture nulls (base data has none), then exercise na.fill +
      // na.drop + coalesce-style repair
      val withNulls = Tables.orders(s, dir)
        .withColumn("maybe_price",
          when(col("o_orderstatus") === "P", lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("O")))
      val filled = withNulls.na.fill(Map("maybe_price" -> -1.0))
      filled
        .select(col("o_orderkey"), col("maybe_price"),
          coalesce(col("maybe_status"), lit("none")).as("status_or_none"))
        .na.drop(Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // correlated scalar subqueries through Catalyst's decorrelation
    // (RewriteCorrelatedScalarSubquery): orders 1.5x above their
    // customer's average price. The predicate is written in exact
    // integer/decimal arithmetic (price*2*count > 3*sum) so the
    // comparison cannot flip on double summation-order ulp drift.
    // Decorrelated plan = ONE aggregate over o_custkey + a join back —
    // no per-row re-scan, which is why this survives 100 TB.
    "subquery_correlated" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_sq_orders")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM graft_sq_orders o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
          |    (SELECT count(*) FROM graft_sq_orders o2
          |     WHERE o2.o_custkey = o.o_custkey)
          |  > 3 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |         FROM graft_sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // SQL LATERAL correlated subquery (top-2 orders per customer) —
    // Catalyst decorrelates the per-row ORDER BY/LIMIT into a windowed
    // rank over ONE shuffle of orders, not a per-customer re-scan; the
    // classic top-N-per-key, through the lateral-join SQL surface
    "join_lateral" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_lat_cust")
      Tables.orders(s, dir).createOrReplaceTempView("graft_lat_orders")
      s.sql(
        """SELECT c_custkey, o_orderkey, o_totalprice
          |FROM graft_lat_cust c, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM graft_lat_orders o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }),

    // explicit salted skew join: events.user_id is the canonical hot-key
    // column; the salted form spreads each key over 8 reducers and must
    // return exactly the plain join's rows — which the plain-SQL oracle
    // checks. SkewJoinSpec additionally asserts bounded per-salt size.
    "join_skew_salted" -> ((s, dir) => {
      graft.operators.SkewJoin.saltedEquiJoin(
          Tables.events(s, dir), Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment")),
          "user_id", "c_custkey", saltBuckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 6).as("sum_value"))
        .orderBy(col("c_mktsegment"))
    }),

    // batch gaps-and-islands sessionization (30-min inactivity gap) —
    // the oracle-checked batch twin of stream_session: lag + running sum
    // of session-break flags, one shuffle on user_id shared by both
    // windows and the final groupBy. Timestamps emitted as epoch seconds
    // so the ns(DuckDB)/µs(Spark) storage precisions cannot drift.
    "sessionize_batch" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess", when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
        .withColumn("sess_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          unix_timestamp(min(col("ts"))).as("sess_start_s"),
          unix_timestamp(max(col("ts"))).as("sess_end_s"))
        .orderBy(col("user_id"), col("sess_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "sessionize_batch" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM y)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start_s,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) AS sess_end_s
        |FROM z GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,

    "subquery_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 2 *
        |    (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  > 3 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "join_lateral" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 6) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "topk_per_key" ->
      """SELECT user_id, event_id, value, rnk FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rnk
        |  FROM events)
        |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,

    "sample_hash" ->
      """SELECT CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
        |    THEN 'val' ELSE 'train' END AS split,
        |  count(*) AS n
        |FROM orders GROUP BY split ORDER BY split""".stripMargin,

    "sample_stratified" ->
      """SELECT c_mktsegment, c_custkey, rn FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 20
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "join_right_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "topk_paged" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20 OFFSET 10""".stripMargin,

    "fn_na" ->
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END, -1.0) AS maybe_price,
        |  coalesce(nullif(o_orderstatus, 'O'), 'none') AS status_or_none
        |FROM orders WHERE o_orderkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin
  )
}
