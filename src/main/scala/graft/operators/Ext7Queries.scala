package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 second operator pack: gaps-and-islands streaks, blocked
  * fuzzy (edit-distance) dedup, seasonal-naive forecast error, calendar
  * edge functions, and bitwise/conditional aggregates.
  *
  * Scale notes:
  * - win_gap_islands: one distinct (hash agg) + ONE keyed window sort —
  *   the island id (`day − row_number`) is the classic O(n log n)
  *   formulation; no self-join, no range scan. Partitions by customer,
  *   so skew is bounded by a single customer's order history.
  * - dedup_fuzzy: Levenshtein is quadratic per pair, so the query
  *   FIRST collapses to DISTINCT names (vocabulary-bounded: 64 names
  *   at sf0.1 regardless of row count) and only then compares within
  *   first-token blocks — never a row-level cross join. This is the
  *   standard blocking discipline for fuzzy matching at 100 TB: the
  *   pair space is |vocab_block|², not |rows|².
  * - ts_seasonal_naive: forecast-by-shift is an equi-join on
  *   (type, day−7), not a window lag — correct under gapped calendars
  *   (lag(7) silently means "7 rows back" when days are missing). Both
  *   the daily rollup and the shift join are group-sized frames.
  * - agg_bitagg / fn_date2: plain two-phase hash agg / pure projection.
  */
object Ext7Queries {

  val queries: Map[String, Q] = Map(
    // gaps-and-islands: longest runs of CONSECUTIVE order days per
    // customer — island id = day − row_number() is constant within a
    // consecutive run and strictly separates runs across gaps
    "win_gap_islands" -> ((s, dir) => {
      val days = Tables.orders(s, dir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), lit("1990-01-01").cast("date")).as("day"))
        .distinct()
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      days.withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"), max(col("day")).as("end_day"))
        .select(col("o_custkey"), col("len"), col("start_day"), col("end_day"))
        .orderBy(desc("len"), col("o_custkey"), col("start_day"))
        .limit(20)
    }),

    // blocked fuzzy dedup: near-identical part names by edit distance.
    // DISTINCT names first (vocabulary-bounded), then Levenshtein only
    // within first-token blocks — the pair space never touches row count
    "dedup_fuzzy" -> ((s, dir) => {
      val names = Tables.part(s, dir).select(col("p_name")).distinct()
        .withColumn("blk", split(col("p_name"), " ").getItem(0))
      val a = names.select(col("blk"), col("p_name").as("name_a"))
      val b = names.select(col("blk"), col("p_name").as("name_b"))
      a.join(b, "blk")
        .filter(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 3)
        .select(col("name_a"), col("name_b"), col("dist"))
        .orderBy(col("dist"), col("name_a"), col("name_b"))
        .limit(20)
    }),

    // seasonal-naive baseline: forecast(day) = actual(day − 7), scored
    // as MAE over daily event counts. The shift is an equi-join on
    // (event_type, day − 7) so calendar gaps never misalign the season
    // (a window lag(7) would silently read "7 rows back")
    "ts_seasonal_naive" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("1990-01-01").cast("date")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      val fc = daily.select(col("event_type"), (col("day") + 7).as("day"),
        col("cnt").as("fc"))
      daily.join(fc, Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          round(avg(abs(col("cnt") - col("fc"))), 6).as("mae"),
          round(max(abs(col("cnt") - col("fc"))).cast("double"), 6).as("max_err"))
        .orderBy(col("event_type"))
    }),

    // calendar edge functions: month-end clamp (add_months / last_day),
    // quarter truncation, ISO week numbering and ISO day-of-week —
    // the fiscal-calendar pack where engines usually disagree
    "fn_date2" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          last_day(col("o_orderdate").cast("date")).as("month_end"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr_start"),
          weekofyear(col("o_orderdate")).as("iso_week"),
          (weekday(col("o_orderdate")) + 1).as("iso_dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          add_months(col("o_orderdate").cast("date"), 1).as("plus_1mo"))
        .orderBy(col("o_orderkey"))
    }),

    // bitwise aggregates + conditional count: AND/OR/XOR folds are
    // mergeable (two-phase hash agg), count_if is the FILTER clause
    "agg_bitagg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr("bit_and(l_linenumber)").as("band"),
          expr("bit_or(l_linenumber)").as("bor"),
          expr("bit_xor(l_linenumber)").as("bxor"),
          expr("count_if(l_quantity > 25)").as("n_big"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }))

  val oracle: Map[String, String] = Map(
    "win_gap_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT o_custkey,
        |    CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day
        |  FROM orders),
        |isl AS (
        |  SELECT o_custkey, day,
        |    day - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS grp
        |  FROM days)
        |SELECT o_custkey, count(*) AS len,
        |  min(day) AS start_day, max(day) AS end_day
        |FROM isl GROUP BY o_custkey, grp
        |ORDER BY len DESC, o_custkey, start_day LIMIT 20""".stripMargin,

    "dedup_fuzzy" ->
      """WITH names AS (
        |  SELECT DISTINCT p_name, split_part(p_name, ' ', 1) AS blk FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3
        |ORDER BY dist, name_a, name_b LIMIT 20""".stripMargin,

    "ts_seasonal_naive" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS INTEGER) AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY event_type, day)
        |SELECT d.event_type, count(*) AS n_days,
        |  round(avg(abs(d.cnt - f.cnt)), 6) AS mae,
        |  round(CAST(max(abs(d.cnt - f.cnt)) AS DOUBLE), 6) AS max_err
        |FROM daily d JOIN daily f
        |  ON d.event_type = f.event_type AND d.day = f.day + 7
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    "fn_date2" ->
      """SELECT o_orderkey,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
        |  CAST(week(o_orderdate) AS INTEGER) AS iso_week,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1mo
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "agg_bitagg" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(l_linenumber) AS INTEGER) AS band,
        |  CAST(bit_or(l_linenumber) AS INTEGER) AS bor,
        |  CAST(bit_xor(l_linenumber) AS INTEGER) AS bxor,
        |  count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
