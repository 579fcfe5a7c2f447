package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 Window functions.
  *
  * Every window has a unique tiebreaker in its ORDER BY — rank ties would
  * otherwise make row_number nondeterministic across engines. Windows are
  * partitioned by a real key (order, user, customer, segment), never a
  * single global partition, so the sort is distributed at scale.
  * Moving averages are computed as exact decimal sum / count instead of
  * avg() so frame aggregation order can't perturb the last ulp.
  */
object WindowQueries {

  val queries: Map[String, Q] = Map(
    "win_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(desc("l_extendedprice"), asc("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 2)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("next_value", lead(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("prev_ts"), col("next_value"))
        .orderBy(col("event_id"))
    }),

    "win_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("running_total", sum(Tables.dec2(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("running_total"))
        .orderBy(col("o_orderkey"))
    }),

    "win_moving" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("mov_sum", sum(Tables.dec2(col("o_totalprice"))).over(w).cast("double"))
        .withColumn("mov_n", count(lit(1)).over(w))
        .withColumn("mov_avg", round(col("mov_sum") / col("mov_n"), 6))
        .select(col("o_orderkey"), col("o_custkey"), col("mov_sum"), col("mov_n"), col("mov_avg"))
        .orderBy(col("o_orderkey"))
    }),

    "win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day_num"))
        .rangeBetween(Window.currentRow, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("day_num", datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
        .withColumn("same_day_sum", sum(Tables.dec2(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("day_num"), col("same_day_sum"))
        .orderBy(col("o_orderkey"))
    }),

    // first_value / last_value / nth_value over an explicit full-partition
    // frame (default frame stops at CURRENT ROW, which makes last_value a
    // trap — pin ROWS UNBOUNDED..UNBOUNDED on both engines)
    "win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .withColumn("first_order", first(col("o_orderkey")).over(w))
        .withColumn("last_order", last(col("o_orderkey")).over(w))
        .withColumn("second_order", nth_value(col("o_orderkey"), 2).over(w))
        .select(col("o_orderkey"), col("o_custkey"),
          col("first_order"), col("last_order"), col("second_order"))
        .orderBy(col("o_orderkey"))
    }),

    // time-interval range frame: per-user moving sum over the trailing 10
    // minutes of event time. The frame bound is exact integer µs on both
    // engines (no float epoch, no truncation drift), and the summed value
    // is cast to decimal so window-order addition is associative-exact.
    // One keyed shuffle; the frame scan is O(rows in window) per row.
    "win_time_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-600000000L, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("trail_sum",
          sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
        .withColumn("trail_n", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          round(col("trail_sum"), 6).as("trail_sum"), col("trail_n"))
        .orderBy(col("event_id"))
    }),

    // IGNORE NULLS navigation: lag/lead/last skipping null measurements
    // (sensor-style sparse series). Nulls injected deterministically
    // (every 3rd order) so both engines see the same gaps.
    "win_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("v",
          when(col("o_orderkey") % 3 =!= 0, col("o_totalprice")))
        .select(col("o_orderkey"), col("o_custkey"),
          lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_v"),
          lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_v"),
          last(col("v"), ignoreNulls = true).over(wRun).as("locf_v"))
        .orderBy(col("o_orderkey"))
    }),

    "win_distribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .select(col("c_custkey"), col("c_mktsegment"), col("quartile"), col("pct_rank"), col("cume"))
        .orderBy(col("c_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "win_rank" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ASC))
        |WHERE rn <= 2 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "win_lag_lead" ->
      """SELECT event_id, user_id,
        |  lag(ts, 1) OVER w AS prev_ts, lead(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "win_running" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "win_moving" ->
      """SELECT o_orderkey, o_custkey, mov_sum, mov_n, round(mov_sum / mov_n, 6) AS mov_avg
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
        |    count(*) OVER w AS mov_n
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |ORDER BY o_orderkey""".stripMargin,

    "win_range_frame" ->
      """SELECT o_orderkey, o_custkey, day_num,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY day_num
        |    RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS DOUBLE) AS same_day_sum
        |FROM (SELECT *, datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "win_ignore_nulls" ->
      """SELECT o_orderkey, o_custkey,
        |  lag(v, 1 IGNORE NULLS) OVER w AS prev_v,
        |  lead(v, 1 IGNORE NULLS) OVER w AS next_v,
        |  last_value(v IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_v
        |FROM (SELECT o_orderkey, o_custkey,
        |        CASE WHEN o_orderkey % 3 <> 0 THEN o_totalprice END AS v
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "win_time_range" ->
      """SELECT event_id, user_id, ts_us,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6) AS trail_sum,
        |  count(*) OVER w AS trail_n
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "win_distribution" ->
      """SELECT c_custkey, c_mktsegment,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
