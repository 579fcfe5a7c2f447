package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Time-series ETL shapes: gap-filling resample and forward-fill (LOCF).
  *
  * Scale notes (100 TB):
  * - ts_gapfill joins a generated spine against pre-aggregated data — the
  *   heavy side is reduced to O(groups x slots) BEFORE the join, and the
  *   spine itself is tiny, so the join broadcasts. Never explode the raw
  *   fact table against a calendar.
  * - ts_locf is one keyed window pass (single shuffle on the partition
  *   key); state per key is a single "last seen non-null", which is what
  *   makes the same shape expressible as a streaming job with
  *   mapGroupsWithState when the data is unbounded.
  * - ts_interpolate is two frames over ONE keyed sort (prev = rows up to
  *   current, next = rows from current) — Spark plans both window specs
  *   over a single Exchange+Sort on user_id, so linear interpolation
  *   costs the same shuffle as LOCF, not two.
  * - ts_downsample reduces the raw series to O(keys x buckets) rows in a
  *   single aggregate whose first/last are rank-free (max_by/min_by on a
  *   composite (ts, event_id) key — no per-bucket sort, mergeable
  *   map-side), which is the shape that survives unbounded retention.
  */
object TsQueries {

  val queries: Map[String, Q] = Map(
    // resample orders to one row per (priority, day) over a fixed window,
    // zero-filling days with no orders — the canonical calendar-spine
    // pattern (ETL "resample"/"gap fill")
    "ts_gapfill" -> ((s, dir) => {
      val lo = "1995-01-01"
      val hi = "1995-03-31"
      val days = s.range(1).select(explode(expr(
        s"sequence(to_timestamp('$lo'), to_timestamp('$hi'), interval 1 day)")).as("day"))
      val prios = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("prio")).distinct()
      val actual = Tables.orders(s, dir)
        .filter(col("o_orderdate").between(
          lit(lo).cast("timestamp"), lit(hi).cast("timestamp")))
        .groupBy(col("o_orderpriority").as("prio"),
          date_trunc("day", col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(Tables.dec2(col("o_totalprice"))).cast("double").as("total"))
      prios.crossJoin(days)
        .join(actual, Seq("prio", "day"), "left")
        .select(col("prio"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"))
        .orderBy(col("prio"), col("day"))
    }),

    // forward-fill (last observation carried forward): null out 'click'
    // values, then repair each user's series with the most recent non-null
    // — one window pass with ignoreNulls, ordered by (ts, event_id)
    "ts_locf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("maybe_v",
          when(col("event_type") === "click", lit(null).cast("double"))
            .otherwise(col("value")))
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          round(last(col("maybe_v"), ignoreNulls = true).over(w), 6).as("filled_v"))
        .orderBy(col("event_id"))
    }),

    // linear interpolation: null out 'view' values, then repair each gap
    // with the time-weighted line between the surrounding observations.
    // Both directions are frames over ONE keyed sort (user_id; ts,event_id)
    // — prev = ROWS UNBOUNDED PRECEDING..CURRENT, next = CURRENT..UNBOUNDED
    // FOLLOWING — so the whole repair is a single shuffle, like ts_locf.
    // Series edges degrade to nearest-observation fill.
    "ts_interpolate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obs = when(col("event_type") === "view", lit(null).cast("double"))
        .otherwise(col("value"))
      val obsT = when(col("event_type") === "view", lit(null).cast("long"))
        .otherwise(unix_micros(col("ts")))
      val base = Tables.events(s, dir)
        .withColumn("t", unix_micros(col("ts")))
        .withColumn("prev_v", last(obs, ignoreNulls = true).over(back))
        .withColumn("prev_t", last(obsT, ignoreNulls = true).over(back))
        .withColumn("next_v", first(obs, ignoreNulls = true).over(fwd))
        .withColumn("next_t", first(obsT, ignoreNulls = true).over(fwd))
      val ratio = (col("t") - col("prev_t")).cast("double") /
        (col("next_t") - col("prev_t")).cast("double")
      base.select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"),
          round(
            when(col("prev_v").isNotNull && col("next_v").isNotNull,
              when(col("next_t") === col("prev_t"), col("prev_v"))
                .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) * ratio))
              .otherwise(coalesce(col("prev_v"), col("next_v"))), 6).as("interp_v"))
        .orderBy(col("event_id"))
    }),

    // OHLC downsample: one row per (user, day) with open/close/lo/hi/n.
    // first/last are rank-free composite-key min_by/max_by on
    // (ts, event_id) — partial-aggregatable map-side (no per-bucket sort,
    // no window), so the reduction is a single mergeable aggregate that
    // survives unbounded retention at 100 TB.
    "ts_downsample" -> ((s, dir) => {
      val key = struct(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("bucket"))
        .agg(
          round(min_by(col("value"), key), 6).as("open_v"),
          round(max_by(col("value"), key), 6).as("close_v"),
          round(min(col("value")), 6).as("lo"),
          round(max(col("value")), 6).as("hi"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("bucket"))
    })
  )

  val oracle: Map[String, String] = Map(
    "ts_gapfill" ->
      """WITH days AS (
        |  SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
        |    TIMESTAMP '1995-03-31', INTERVAL 1 DAY)) AS day),
        |prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
        |actual AS (
        |  SELECT o_orderpriority AS prio, date_trunc('day', o_orderdate) AS day,
        |    count(*) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders
        |  WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31'
        |  GROUP BY 1, 2)
        |SELECT p.prio AS prio, d.day AS day,
        |  coalesce(a.n, 0) AS n, coalesce(a.total, 0.0) AS total
        |FROM prios p CROSS JOIN days d
        |LEFT JOIN actual a ON a.prio = p.prio AND a.day = d.day
        |ORDER BY p.prio, d.day""".stripMargin,

    "ts_locf" ->
      """SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  round(last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END
        |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS filled_v
        |FROM events ORDER BY event_id""".stripMargin,

    "ts_interpolate" ->
      """WITH base AS (
        |  SELECT event_id, user_id, ts, epoch_us(ts) AS t,
        |    last_value(CASE WHEN event_type='view' THEN NULL ELSE value END IGNORE NULLS)
        |      OVER back AS prev_v,
        |    last_value(CASE WHEN event_type='view' THEN NULL ELSE epoch_us(ts) END IGNORE NULLS)
        |      OVER back AS prev_t,
        |    first_value(CASE WHEN event_type='view' THEN NULL ELSE value END IGNORE NULLS)
        |      OVER fwd AS next_v,
        |    first_value(CASE WHEN event_type='view' THEN NULL ELSE epoch_us(ts) END IGNORE NULLS)
        |      OVER fwd AS next_t
        |  FROM events
        |  WINDOW
        |    back AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  round(CASE WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
        |      CASE WHEN next_t = prev_t THEN prev_v
        |        ELSE prev_v + (next_v - prev_v) *
        |          (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE)) END
        |    ELSE coalesce(prev_v, next_v) END, 6) AS interp_v
        |FROM base ORDER BY event_id""".stripMargin,

    "ts_downsample" ->
      """SELECT user_id, CAST(ts AS DATE) AS bucket,
        |  round(first(value ORDER BY ts, event_id), 6) AS open_v,
        |  round(last(value ORDER BY ts, event_id), 6) AS close_v,
        |  round(min(value), 6) AS lo, round(max(value), 6) AS hi,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, bucket""".stripMargin
  )
}
