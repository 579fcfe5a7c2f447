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
        |FROM events ORDER BY event_id""".stripMargin
  )
}
