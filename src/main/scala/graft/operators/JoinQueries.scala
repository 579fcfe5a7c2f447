package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 Joins.
  *
  * Scale notes: dimension joins (nation/region/customer-by-key) carry an
  * explicit broadcast() hint so no shuffle of the fact side ever happens;
  * the fact-fact joins (lineitem⋈orders) shuffle on the join key — the
  * partition-count is the driver's shuffle.partitions and AQE coalesces.
  * join_asof is the windowed formulation (sort within user partition) —
  * O(n log n) per partition, no pairwise blowup — while its oracle uses
  * the equivalent (but quadratic) join+max SQL; semantics agree as long
  * as (user_id, ts) has no exact duplicate timestamps across click and
  * purchase (holds for the generated µs-precision data).
  */
object JoinQueries {

  val queries: Map[String, Q] = Map(
    "join_broadcast" -> ((s, dir) => {
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .orderBy(col("n_nationkey"))
    }),

    "join_shuffle" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(Tables.dec2(col("l_extendedprice")) *
            (lit(1) - col("l_discount").cast("decimal(4,2)"))).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("c_mktsegment"))
    }),

    "join_left_outer" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    "join_full_outer" -> ((s, dir) => {
      val ok = Tables.orders(s, dir).select(col("o_orderkey")).distinct()
      val lk = Tables.lineitem(s, dir).select(col("l_orderkey")).distinct()
      ok.join(lk, col("o_orderkey") === col("l_orderkey"), "full")
        .select(
          coalesce(col("o_orderkey"), col("l_orderkey")).as("orderkey"),
          col("o_orderkey").isNotNull.as("has_order"),
          col("l_orderkey").isNotNull.as("has_lineitem"))
        .orderBy(col("orderkey"))
    }),

    "join_semi" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_anti" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_cross" -> ((s, dir) => {
      Tables.region(s, dir).select(col("r_name"))
        .crossJoin(Tables.nation(s, dir).select(col("n_name")))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "join_theta_range" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      val a = ev.select(col("event_id").as("id_a"), col("user_id").as("u_a"), col("ts").as("ts_a"))
      val b = ev.select(col("event_id").as("id_b"), col("user_id").as("u_b"), col("ts").as("ts_b"))
      a.join(b, col("u_a") === col("u_b") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 10 MINUTES"))
        .select(col("id_a"), col("id_b"), col("u_a").as("user_id"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // routed through the library's generic as-of join (union + one
    // keyed window pass — no range-join pair explosion; see JoinOps)
    "join_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      graft.api.JoinOps.asofJoin(purchases, clicks, "user_id", "ts",
          rightCols = Seq("ts"), inclusive = false)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts").as("last_click_ts"))
        .orderBy(col("event_id"))
    }),

    // forward as-of with a tolerance bound (time-to-conversion): each
    // click picks the user's NEXT purchase, but only within 7 days —
    // same union + one-keyed-window plan as join_asof (the tolerance is
    // a post-pick filter on the carried right timestamp, not a range
    // join), so the 100 TB shape is identical: one shuffle, no
    // candidate-pair explosion.
    "join_asof_fwd" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"))
      graft.api.JoinOps.asofJoin(clicks, purchases, "user_id", "ts",
          rightCols = Seq("ts"), inclusive = false, direction = "forward",
          toleranceUs = Some(7L * 24 * 3600 * 1000000L))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          unix_timestamp(col("asof_ts")).as("next_purchase_s"))
        .orderBy(col("event_id"))
    }),

    // nearest as-of: each error event pairs with the user's closest
    // click in EITHER direction (tie → the earlier click). Both
    // directional candidates come from two window functions over the
    // same union/partitioning/ordering, so the plan is still ONE
    // Exchange + Sort + a single Window operator — the second direction
    // costs no extra shuffle (pandas merge_asof nearest, Spark-shaped).
    "join_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"))
      graft.api.JoinOps.asofJoin(errors, clicks, "user_id", "ts",
          rightCols = Seq("ts"), direction = "nearest")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          unix_timestamp(col("asof_ts")).as("nearest_click_s"))
        .orderBy(col("event_id"))
    }),

    // bucketed range join — the 100 TB plan for join_theta_range's
    // "events within 10 minutes per user" shape. Binning event time into
    // 10-minute buckets and replicating the left side into (bin, bin+1)
    // turns the inequality join into an EQUI-join on (user, bin): hash-
    // partitionable, AQE-skew-splittable, no per-user full pairing. Each
    // qualifying pair matches in exactly one replica (b's bin is fixed),
    // so no distinct pass is needed. Oracled against the same SQL as the
    // theta form — identical rows, scalable plan.
    "join_range_binned" -> ((s, dir) => {
      val binUs = 600000000L // 10 minutes in microseconds
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val a = ev.select(col("event_id").as("id_a"), col("user_id").as("u_a"),
          col("us").as("us_a"))
        .withColumn("bin", explode(array(
          floor(col("us_a") / binUs), floor(col("us_a") / binUs) + 1)))
      val b = ev.select(col("event_id").as("id_b"), col("user_id").as("u_b"),
          col("us").as("us_b"))
        .withColumn("bin_b", floor(col("us_b") / binUs))
      a.join(b, col("u_a") === col("u_b") && col("bin") === col("bin_b") &&
          col("us_b") > col("us_a") && col("us_b") <= col("us_a") + binUs)
        .select(col("id_a"), col("id_b"), col("u_a").as("user_id"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // runtime bloom-filter join: a selective predicate on the build side
    // (urgent orders) is turned into a bloom filter that pre-filters the
    // probe side's scan BEFORE the shuffle — at 100 TB this drops ~80% of
    // lineitem rows from the exchange. The injection thresholds are sized
    // for clusters, so they are scoped down via a CHILD session
    // (newSession: own SQLConf, shared SparkContext/cache) — the shared
    // session's confs are never touched, so concurrently-planned queries
    // cannot observe the overrides (the set/restore race a shared conf
    // would have). The bloom filter survives in the plan (asserted in
    // PlanSpec: might_contain on the probe side).
    // AQE runtime skew-join split: 90% of the fact rows share ONE join
    // key, so a static plan leaves one straggler task doing 90% of the
    // probe. With skew thresholds scoped down to the test's data volume
    // (a child session — at 100 TB the defaults fire on real skew), AQE
    // re-plans the sort-merge join at runtime and splits the oversized
    // partition across tasks (`skew=true` in the final adaptive plan,
    // asserted by AqeSpec). The manual twin is join_skew_salted; this is
    // the zero-code-change runtime alternative.
    "join_aqe_skew" -> ((s0, dir) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // coalescing would merge the small partitions FIRST and mask the
      // skew signal at test scale; production keeps it on (the hot
      // partition is then far above the default 256MB threshold anyway)
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // pin the reduce width so the skew statistics (hot vs median) are
      // host-independent; the md5 payload keeps the hot partition
      // INCOMPRESSIBLE (bare numeric constant-key columns compress below
      // any workable threshold at test scale)
      s.conf.set("spark.sql.shuffle.partitions", "8")
      // skew splits happen at MAP-TASK granularity: a reduce partition
      // fed by ONE mapper cannot be split at all — the silent reason
      // "obvious" skew demos report 0 skewed partitions. The testdata
      // table is a single small parquet file (= one row group = one
      // mapper), so spread the fact over 8 mappers first; a real
      // multi-file table has many mappers for free. The md5 payload
      // keeps the hot partition incompressible so the byte stats see it.
      val fact = Tables.lineitem(s, dir)
        .repartition(8)
        .select(when(col("l_orderkey") % 10 < 9, 0L)
          .otherwise(col("l_orderkey") % 1000).as("k"),
          Tables.dec2(col("l_quantity")).as("q"),
          concat((0 until 4).map(i =>
            md5(concat(lit(i.toString), col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string")))): _*).as("h"))
      // the dim must reach the join as a BARE shuffle (no agg between
      // stage and join) — OptimizeSkewedJoin pattern-matches
      // SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) and an intermediate
      // operator on either side disables the rewrite
      val dim = s.range(1000).select(col("id").as("k"), (col("id") % 7).as("dim_tag"))
      fact.join(dim, "k")
        .groupBy((col("k") === 0).as("is_hot"))
        .agg(count(lit(1)).as("n"), sum(col("q")).cast("double").as("sum_q"),
          min(col("h")).as("min_h"))
        .orderBy(col("is_hot"))
    }),

    "join_bloom" -> ((s0, dir) => {
      val s = s0.newSession()
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("l_extendedprice"))).cast("double").as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    "join_interval" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("o_orderdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(
    "join_aqe_skew" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
        |              ELSE l_orderkey % 1000 END AS k,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |    md5('0' || l_orderkey || ':' || l_linenumber)
        |      || md5('1' || l_orderkey || ':' || l_linenumber)
        |      || md5('2' || l_orderkey || ':' || l_linenumber)
        |      || md5('3' || l_orderkey || ':' || l_linenumber) AS h
        |  FROM lineitem),
        |dim AS (SELECT i AS k FROM generate_series(0, 999) t(i))
        |SELECT f.k = 0 AS is_hot, count(*) AS n,
        |  CAST(sum(f.q) AS DOUBLE) AS sum_q,
        |  min(f.h) AS min_h
        |FROM fact f JOIN dim d ON d.k = f.k
        |GROUP BY is_hot ORDER BY is_hot""".stripMargin,

    "join_bloom" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "join_shuffle" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT coalesce(o.o_orderkey, l.l_orderkey) AS orderkey,
        |  o.o_orderkey IS NOT NULL AS has_order,
        |  l.l_orderkey IS NOT NULL AS has_lineitem
        |FROM (SELECT DISTINCT o_orderkey FROM orders) o
        |FULL OUTER JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
        |  ON o.o_orderkey = l.l_orderkey
        |ORDER BY orderkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_theta_range" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY id_a, id_b""".stripMargin,

    "join_range_binned" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY id_a, id_b""".stripMargin,

    "join_asof" ->
      """SELECT p.event_id, p.user_id, p.ts, max(c.ts) AS last_click_ts
        |FROM events p
        |LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id, p.ts
        |ORDER BY p.event_id""".stripMargin,

    "join_asof_fwd" ->
      """SELECT c.event_id, c.user_id,
        |  CAST(floor(epoch(c.ts)) AS BIGINT) AS ts_s,
        |  CAST(floor(epoch(min(p.ts))) AS BIGINT) AS next_purchase_s
        |FROM events c
        |LEFT JOIN events p
        |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
        | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 7 DAY
        |WHERE c.event_type = 'click'
        |GROUP BY c.event_id, c.user_id, c.ts
        |ORDER BY c.event_id""".stripMargin,

    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |b AS (SELECT e.event_id, max(c.ts) AS back_ts FROM e
        |      LEFT JOIN c ON c.user_id = e.user_id AND c.ts <= e.ts
        |      GROUP BY e.event_id),
        |f AS (SELECT e.event_id, min(c.ts) AS fwd_ts FROM e
        |      LEFT JOIN c ON c.user_id = e.user_id AND c.ts >= e.ts
        |      GROUP BY e.event_id)
        |SELECT e.event_id, e.user_id,
        |  CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
        |  CAST(floor(epoch(CASE
        |    WHEN fwd_ts IS NULL THEN back_ts
        |    WHEN back_ts IS NULL THEN fwd_ts
        |    WHEN e.ts - back_ts <= fwd_ts - e.ts THEN back_ts
        |    ELSE fwd_ts END)) AS BIGINT) AS nearest_click_s
        |FROM e JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY e.event_id""".stripMargin,

    "join_interval" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
