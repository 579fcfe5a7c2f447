package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-15 second batch: sessionized bounce, SES backtesting, Zipf /
  * Yule lexical statistics, variance-homogeneity and paired-binary
  * inference, WOE feature encoding, and cohort retention.
  *
  * Numeric discipline matches Ext14: exact integer/decimal accumulation
  * wherever possible; ln()/division only in final scalar formulas, with
  * per-term 9dp rounding before any float sum (1-ulp libm differences
  * between engines die at 9dp); every rank tie-breaks on an explicit
  * column.
  *
  * Scale: all group domains here are enum- or calendar-bounded (event
  * types, sources, segments, weeks, days); the only unpartitioned
  * window (Zipf rank) runs over a top-200 frame produced by a parallel
  * TakeOrdered. The SES recursion is over the DAILY series — bounded by
  * the calendar (~2.4k rows over the 1995–2001 orders span), computed
  * on the driver like events_markov_stationary's enum-bounded
  * iteration; the per-day aggregation underneath is a full map-side
  * combined shuffle.
  */
object Ext15Queries {

  /** Sessionized events (30-min gap), the sessionize_batch spine:
    * per-session event count plus the opening event's type (the row
    * with new_sess = 1 carries exactly its session's id and type).
    */
  private def sessions(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val counts = flagged.groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"))
    val openers = flagged.filter(col("new_sess") === 1)
      .select(col("user_id"), col("sess_id"), col("event_type").as("first_type"))
    counts.join(openers, Seq("user_id", "sess_id"))
  }

  val queries: Map[String, Q] = Map(

    // Bounce rate by session-opening event type: the share of
    // sessions that end after their first event. One user-keyed
    // window pass + a 5-row (event-type-bounded) roll-up.
    "events_bounce_rate" -> ((s, dir) => {
      sessions(s, dir)
        .groupBy(col("first_type"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
          round(sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("bounce_rate"))
        .orderBy(col("first_type"))
    }),

    // Simple-exponential-smoothing backtest of daily revenue
    // (α = 0.3, one-step-ahead): level quantized to WHOLE CENTS each
    // step — floor(0.3·y + 0.7·f + 0.5) — so the recursion, the
    // errors, and their sums are EXACT integers on both engines (no
    // float-order drift anywhere). The daily series is
    // calendar-bounded, so the fold runs on the driver; the oracle
    // replays it as a recursive CTE.
    "ts_ses_backtest" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(date_trunc("DAY", col("o_orderdate")).as("d"))
        .agg(sum((Tables.dec2(col("o_totalprice")) * 100).cast("long")).as("y"))
        .orderBy(col("d"))
        .collect().map(r => r.getLong(1))
      var f = daily.head.toDouble
      var sumAbsErr = 0L
      var sumY = 0L
      daily.tail.foreach { y =>
        sumAbsErr += math.abs(y - f.toLong)
        sumY += y
        f = math.floor(0.3 * y + 0.7 * f + 0.5)
      }
      val n = daily.length.toLong
      import s.implicits._
      Seq((n, f.toLong, sumAbsErr,
        BigDecimal(sumAbsErr.toDouble / (n - 1) / 100)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(sumAbsErr.toDouble / sumY)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("n_days", "final_level_cents", "sum_abs_err_cents", "mae", "wape")
    }),

    // Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the
    // top-200 tokens (parallel TakeOrdered; ties break on the token).
    // The only window runs over those 200 rows. Per-term ln values
    // rounded at 9dp; slope/intercept/r² at 6dp.
    "text_zipf_ols" -> ((s, dir) => {
      val top = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok"))
        .limit(200)
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
        .select(round(log(col("rank")), 9).as("x"),
          round(log(col("freq")), 9).as("y"))
        .select(col("x"), col("y"), round(col("x") * col("y"), 9).as("xy"),
          round(col("x") * col("x"), 9).as("xx"),
          round(col("y") * col("y"), 9).as("yy"))
      ranked.agg(count(lit(1)).as("n_terms"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
        sum(col("xx")).as("sxx"), sum(col("yy")).as("syy"))
        .select(col("n_terms"),
          round((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
            (col("n_terms") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("sy") - (col("n_terms") * col("sxy") - col("sx") * col("sy")) /
            (col("n_terms") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
            col("n_terms"), 6).as("intercept"),
          round(pow(col("n_terms") * col("sxy") - col("sx") * col("sy"), 2) /
            ((col("n_terms") * col("sxx") - col("sx") * col("sx")) *
             (col("n_terms") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
    }),

    // Yule's characteristic K per source (vocabulary concentration:
    // 10⁴·(Σc² − N)/N²) plus the hapax share — repetitiveness signals a
    // corpus-quality dashboard tracks per ingest source. Exact integer
    // moments end to end; one (source, token) shuffle.
    "text_yule_k" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
          sum((col("c").cast("decimal(19,0)") * col("c")).cast("decimal(38,0)"))
            .cast("double").as("sc2"))
        .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
          round(lit(1e4) * (col("sc2") - col("n_tokens")) /
            (col("n_tokens").cast("double") * col("n_tokens")), 6).as("yule_k"),
          round(col("hapax").cast("double") / col("vocab"), 6).as("hapax_frac"))
        .orderBy(col("source"))
    }),

    // Bartlett's test of variance homogeneity of doc length across the
    // 20 sources. Per-group moments are exact (Σx long, Σx² decimal);
    // the ln terms are rounded at 9dp before the k-bounded sum.
    "stat_bartlett" -> ((s, dir) => {
      val g = Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum((col("n_chars").cast("decimal(19,0)") * col("n_chars"))
            .cast("decimal(38,0)")).cast("double").as("sxx"))
        .select(col("n"),
          ((col("sxx") - col("sx").cast("double") * col("sx") / col("n")) /
            (col("n") - 1)).as("s2"))
      val a = g.agg(count(lit(1)).as("k"), sum(col("n")).as("bign"),
        sum((col("n") - 1) * col("s2")).as("pooled_num"),
        sum(round((col("n") - 1) * log(col("s2")), 9)).as("sum_ln"),
        sum(round(lit(1.0) / (col("n") - 1), 9)).as("sum_inv"))
      a.select(col("k"), col("bign").as("n"),
        round(((col("bign") - col("k")) *
          log(col("pooled_num") / (col("bign") - col("k"))) - col("sum_ln")) /
          (lit(1.0) + (col("sum_inv") - lit(1.0) / (col("bign") - col("k"))) /
            (lit(3.0) * (col("k") - 1))), 6).as("bartlett_stat"))
    }),

    // McNemar's paired-binary test: per customer, "placed a ≥ 250k
    // order" in 1995–1997 vs 1998–2001 — did the high-value propensity
    // shift? Discordant counts b/c are exact; the statistic (with and
    // without continuity correction) is one final division.
    "stat_mcnemar" -> ((s, dir) => {
      val per = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          max(when(year(col("o_orderdate")) <= 1997 &&
            col("o_totalprice") >= 250000, 1).otherwise(0)).as("h1"),
          max(when(year(col("o_orderdate")) >= 1998 &&
            col("o_totalprice") >= 250000, 1).otherwise(0)).as("h2"))
      per.agg(
        sum(when(col("h1") === 1 && col("h2") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("h1") === 0 && col("h2") === 1, 1L).otherwise(0L)).as("c"))
        .select(col("b"), col("c"),
          round(pow(col("b") - col("c"), 2) / (col("b") + col("c")), 6)
            .as("mcnemar_stat"),
          round(pow(abs(col("b") - col("c")) - 1, 2) / (col("b") + col("c")), 6)
            .as("mcnemar_cc"))
    }),

    // Weight-of-evidence encoding of c_mktsegment against the
    // "positive account balance" target (+0.5 Laplace smoothing), with
    // the per-segment information-value term. Segment domain is
    // enum-bounded; counts exact; one ln per segment at 6dp.
    "feat_woe" -> ((s, dir) => {
      val seg = Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(sum(when(col("c_acctbal") > 0, 1L).otherwise(0L)).as("good"),
          sum(when(col("c_acctbal") <= 0, 1L).otherwise(0L)).as("bad"))
      val tot = seg.agg(sum(col("good")).as("g"), sum(col("bad")).as("b"))
      val woe = (col("good") + 0.5) / (col("g") + 0.5) * (col("b") + 0.5) /
        (col("bad") + 0.5)
      seg.crossJoin(broadcast(tot))
        .select(col("c_mktsegment"), col("good"), col("bad"),
          round(log(woe), 6).as("woe"),
          round(((col("good") + 0.5) / (col("g") + 0.5) -
            (col("bad") + 0.5) / (col("b") + 0.5)) * round(log(woe), 6), 6)
            .as("iv_term"))
        .orderBy(col("c_mktsegment"))
    }),

    // Weekly cohort retention matrix: users grouped by first-seen ISO
    // week; each later week's distinct actives per cohort. The grid is
    // calendar × calendar (bounded); both aggregations are keyed
    // shuffles with map-side combine.
    "events_retention_matrix" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("WEEK", col("ts")).cast("date").as("wk"))
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    })
  )

  val oracle: Map[String, String] = Map(

    "events_bounce_rate" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT user_id, event_type, new_sess,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM y),
        |counts AS (
        |  SELECT user_id, sess_id, count(*) AS n_events
        |  FROM z GROUP BY user_id, sess_id),
        |openers AS (
        |  SELECT user_id, sess_id, event_type AS first_type
        |  FROM z WHERE new_sess = 1)
        |SELECT first_type, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
        |  round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
        |    AS bounce_rate
        |FROM counts JOIN openers USING (user_id, sess_id)
        |GROUP BY first_type ORDER BY first_type""".stripMargin,

    "ts_ses_backtest" ->
      """WITH RECURSIVE daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS d,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT row_number() OVER (ORDER BY d) AS i, y FROM daily),
        |ses AS (
        |  SELECT CAST(1 AS BIGINT) AS i, CAST(y AS DOUBLE) AS f
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT s.i + 1, floor(0.3 * CAST(x.y AS DOUBLE) + 0.7 * s.f + 0.5)
        |  FROM ses s JOIN idx x ON x.i = s.i
        |  WHERE s.i <= (SELECT max(i) FROM idx)),
        |err AS (
        |  SELECT x.i, abs(x.y - CAST(s.f AS BIGINT)) AS ae, x.y
        |  FROM idx x JOIN ses s ON s.i = x.i WHERE x.i >= 2)
        |SELECT (SELECT max(i) FROM idx) AS n_days,
        |  (SELECT CAST(f AS BIGINT) FROM ses ORDER BY i DESC LIMIT 1)
        |    AS final_level_cents,
        |  CAST(sum(ae) AS BIGINT) AS sum_abs_err_cents,
        |  round(sum(ae) * 1.0 / count(*) / 100, 6) AS mae,
        |  round(sum(ae) * 1.0 / sum(y), 6) AS wape
        |FROM err""".stripMargin,

    "text_zipf_ols" ->
      """WITH tok AS (
        |  SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
        |freqs AS (
        |  SELECT tok, count(*) AS freq FROM tok WHERE tok <> '' GROUP BY tok
        |  ORDER BY freq DESC, tok LIMIT 200),
        |ranked AS (
        |  SELECT round(ln(row_number() OVER (ORDER BY freq DESC, tok)), 9) AS x,
        |    round(ln(freq), 9) AS y
        |  FROM freqs),
        |t AS (
        |  SELECT x, y, round(x * y, 9) AS xy, round(x * x, 9) AS xx,
        |    round(y * y, 9) AS yy
        |  FROM ranked),
        |a AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(xy) AS sxy,
        |    sum(xx) AS sxx, sum(yy) AS syy
        |  FROM t)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |    AS intercept,
        |  round(power(n * sxy - sx * sy, 2) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM a""".stripMargin,

    "text_yule_k" ->
      """WITH tok AS (
        |  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT source, tok, count(*) AS c FROM tok WHERE tok <> ''
        |      GROUP BY 1, 2),
        |a AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |    CAST(sum(CAST(c AS DECIMAL(19,0)) * c) AS DOUBLE) AS sc2
        |  FROM c GROUP BY source)
        |SELECT source, n_tokens, vocab, hapax,
        |  round(1e4 * (sc2 - n_tokens) / (CAST(n_tokens AS DOUBLE) * n_tokens), 6)
        |    AS yule_k,
        |  round(CAST(hapax AS DOUBLE) / vocab, 6) AS hapax_frac
        |FROM a ORDER BY source""".stripMargin,

    "stat_bartlett" ->
      """WITH g AS (
        |  SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sx,
        |    CAST(sum(CAST(n_chars AS DECIMAL(19,0)) * n_chars) AS DOUBLE) AS sxx
        |  FROM documents GROUP BY source),
        |s AS (
        |  SELECT n, (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS s2
        |  FROM g),
        |a AS (
        |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS bign,
        |    sum((n - 1) * s2) AS pooled_num,
        |    sum(round((n - 1) * ln(s2), 9)) AS sum_ln,
        |    sum(round(1.0 / (n - 1), 9)) AS sum_inv
        |  FROM s)
        |SELECT CAST(k AS BIGINT) AS k, bign AS n,
        |  round(((bign - k) * ln(pooled_num / (bign - k)) - sum_ln) /
        |    (1.0 + (sum_inv - 1.0 / (bign - k)) / (3.0 * (k - 1))), 6)
        |    AS bartlett_stat
        |FROM a""".stripMargin,

    "stat_mcnemar" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN year(o_orderdate) <= 1997 AND o_totalprice >= 250000
        |      THEN 1 ELSE 0 END) AS h1,
        |    max(CASE WHEN year(o_orderdate) >= 1998 AND o_totalprice >= 250000
        |      THEN 1 ELSE 0 END) AS h2
        |  FROM orders GROUP BY o_custkey)
        |SELECT
        |  CAST(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |  CAST(sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |  round(power(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
        |      - sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END), 2) * 1.0 /
        |    (sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)), 6)
        |    AS mcnemar_stat,
        |  round(power(abs(sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
        |      - sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)) - 1, 2) * 1.0 /
        |    (sum(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)), 6)
        |    AS mcnemar_cc
        |FROM per""".stripMargin,

    "feat_woe" ->
      """WITH seg AS (
        |  SELECT c_mktsegment,
        |    CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS good,
        |    CAST(sum(CASE WHEN c_acctbal <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad
        |  FROM customer GROUP BY c_mktsegment),
        |tot AS (SELECT CAST(sum(good) AS BIGINT) AS g,
        |               CAST(sum(bad) AS BIGINT) AS b FROM seg)
        |SELECT c_mktsegment, good, bad,
        |  round(ln((good + 0.5) / (g + 0.5) * (b + 0.5) / (bad + 0.5)), 6) AS woe,
        |  round(((good + 0.5) / (g + 0.5) - (bad + 0.5) / (b + 0.5)) *
        |    round(ln((good + 0.5) / (g + 0.5) * (b + 0.5) / (bad + 0.5)), 6), 6)
        |    AS iv_term
        |FROM seg CROSS JOIN tot ORDER BY c_mktsegment""".stripMargin,

    "events_retention_matrix" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |first AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
        |SELECT cohort_wk,
        |  CAST((wk - cohort_wk) / 7 AS INT) AS week_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM ev JOIN first USING (user_id)
        |GROUP BY cohort_wk, week_offset
        |ORDER BY cohort_wk, week_offset""".stripMargin
  )
}
