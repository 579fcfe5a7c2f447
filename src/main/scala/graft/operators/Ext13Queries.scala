package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 pack: inequality metrics (Gini / Theil), robust-anomaly and
  * trend tests (MAD z, Mann-Kendall), experiment-design stats (two-
  * proportion power, order-statistic median CI), training-data weights
  * (shingle soft-dedup, importance reweighting, split novelty), funnel
  * latency, distribution-position windows, and eigenvector centrality.
  *
  * Scale notes (100 TB design):
  * - agg_gini / stat_quantile_ci / win_percent_rank: per-GROUP rank
  *   windows (segment / priority) — each group lands on one reducer,
  *   fine while groups are enum-bounded (5 here; the orders_rfm
  *   regime). Past that, swap rank for the range-partitioned-rank
  *   rewrite that feat_quantile_bin_scaled ships.
  * - ts_mad_anomaly / stat_mann_kendall: inputs are DAILY aggregates —
  *   the day-pair join is calendar-bounded (n_days², not rows²); the
  *   heavy part is the one groupBy building the series.
  * - stat_power_twoprop: two map-side-combinable aggregations and one
  *   scalar formula — O(events) scan, O(1) everything else.
  * - dedup_soft_weights: shingle explode (O(tokens)) → hash groupBy
  *   document-frequency → join back. The SoftDeDup reweighting: docs
  *   whose shingles repeat across the corpus count fractionally.
  * - sample_importance: per-lang counts broadcast back over the
  *   corpus; weights = target share / observed share; ESS in-band.
  * - text_ngram_novelty: distinct (lang, bigram) per split, one hash
  *   LEFT anti-style join on the bigram — linear in bigram types.
  * - events_funnel_time: two keyed min-aggregations and one global
  *   percentile — the events_funnel shape plus latency percentiles.
  * - graph_eigen_centrality: power iteration x ← normalize(A·x) on the
  *   staged co-purchase edges — each iteration one O(E) equi-join +
  *   node agg, L2 norm via a 1-row broadcast (the graph_pagerank
  *   pattern; at 100 TB the edge list is the staged table every graph
  *   op shares).
  */
object Ext13Queries {

  private def toks13: org.apache.spark.sql.Column =
    filter(split(col("text"), " "), t => t =!= lit(""))

  val queries: Map[String, Q] = Map(

    // Gini coefficient of positive account balances per market segment
    // (the sorted-rank formula: Σ(2i−n−1)·x_i / (n·Σx)).
    "agg_gini" -> ((s, dir) => {
      val w = Window.partitionBy(col("seg")).orderBy(col("v"), col("k"))
      val wN = Window.partitionBy(col("seg"))
      Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0)
        .select(col("c_mktsegment").as("seg"), col("c_acctbal").as("v"),
          col("c_custkey").as("k"))
        .withColumn("i", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wN))
        .withColumn("sv", sum(col("v")).over(wN))
        .groupBy(col("seg"))
        .agg(max(col("n")).as("n"),
          round(sum((lit(2.0) * col("i") - col("n") - 1) * col("v")) /
            (max(col("n")) * max(col("sv"))), 6).as("gini"))
        .orderBy(col("seg"))
    }),

    // Theil T inequality index per segment: avg((x/μ)·ln(x/μ)).
    "agg_theil" -> ((s, dir) => {
      val x = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0)
        .select(col("c_mktsegment").as("seg"), col("c_acctbal").as("v"))
      val m = x.groupBy(col("seg")).agg(avg(col("v")).as("mu"))
      x.join(broadcast(m), "seg")
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          round(avg((col("v") / col("mu")) * log(col("v") / col("mu"))), 6)
            .as("theil_t"))
        .orderBy(col("seg"))
    }),

    // Robust anomaly scan over the daily value series per event type:
    // modified z = 0.6745·|x − median| / MAD, flag > 3.5 (Iglewicz-
    // Hoaglin). Medians interpolate identically on both engines.
    "ts_mad_anomaly" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(round(sum(col("value")), 6).as("x"))
      val st = daily.groupBy(col("event_type"))
        .agg(expr("percentile(x, 0.5)").as("med"))
      val ad = daily.join(broadcast(st), "event_type")
        .withColumn("dev", abs(col("x") - col("med")))
      val md = ad.groupBy(col("event_type"))
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      ad.join(broadcast(md), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          count(when(lit(0.6745) * col("dev") / col("mad") > 3.5, 1))
            .as("n_anomalies"),
          round(max(lit(0.6745) * col("dev") / col("mad")), 6).as("max_robust_z"))
        .orderBy(col("event_type"))
    }),

    // Two-proportion z-test power analysis: users hash-split A/B,
    // "converted" = ≥12 purchases; required n per arm to detect the
    // observed delta at α=0.05 (two-sided), power 0.8.
    "stat_power_twoprop" -> ((s, dir) => {
      val u = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg((count(when(col("event_type") === "purchase", 1)) >= 12)
          .cast("int").as("conv"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B"))
      val r = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), avg(col("conv").cast("double")).as("p"))
      val w = r.agg(
        max(when(col("arm") === "A", col("p"))).as("pa"),
        max(when(col("arm") === "B", col("p"))).as("pb"),
        max(when(col("arm") === "A", col("n"))).as("na"),
        max(when(col("arm") === "B", col("n"))).as("nb"))
      val pbar = (col("pa") + col("pb")) / 2
      w.select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("pa"), 6).as("p_a"), round(col("pb"), 6).as("p_b"),
        ceil(pow(lit(1.959964) * sqrt(lit(2) * pbar * (lit(1) - pbar)) +
            lit(0.841621) * sqrt(col("pa") * (lit(1) - col("pa")) +
              col("pb") * (lit(1) - col("pb"))), 2) /
          pow(abs(col("pa") - col("pb")), 2)).cast("double").as("n_per_arm"))
    }),

    // Distribution-free median CI per segment: the order statistics at
    // ranks n/2 ∓ z·√n/2 bound the median at ~95% (binomial normal
    // approximation) — the robust-stats answer to "error bars on a
    // median" that needs only a rank window, no resampling.
    "stat_quantile_ci" -> ((s, dir) => {
      val w = Window.partitionBy(col("seg")).orderBy(col("v"), col("k"))
      val wN = Window.partitionBy(col("seg"))
      Tables.customer(s, dir)
        .select(col("c_mktsegment").as("seg"), col("c_acctbal").as("v"),
          col("c_custkey").as("k"))
        .withColumn("i", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wN))
        .groupBy(col("seg"))
        .agg(max(col("n")).as("n"),
          round(expr("percentile(v, 0.5)"), 6).as("med"),
          round(max(when(col("i") ===
            floor(col("n") / 2.0 - lit(0.979982) * sqrt(col("n"))), col("v"))), 6)
            .as("ci_lo"),
          round(max(when(col("i") ===
            ceil(col("n") / 2.0 + 1 + lit(0.979982) * sqrt(col("n"))), col("v"))), 6)
            .as("ci_hi"))
        .orderBy(col("seg"))
    }),

    // Mann-Kendall trend test per event type over the daily series:
    // S = Σ_{i<j} sign(x_j − x_i), z with the continuity correction.
    // The pair join is calendar-bounded (days², never rows²).
    "stat_mann_kendall" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(round(sum(col("value")), 6).as("x"))
        .localCheckpoint(true)
      val a = daily.select(col("event_type"), col("d").as("da"), col("x").as("xa"))
      val b = daily.select(col("event_type"), col("d").as("db"), col("x").as("xb"))
      val pairs = a.join(b, Seq("event_type")).filter(col("da") < col("db"))
        .select(col("event_type"), signum(col("xb") - col("xa")).as("sg"))
      val sTab = pairs.groupBy(col("event_type")).agg(sum(col("sg")).as("S"))
      val nTab = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      sTab.join(nTab, "event_type")
        .select(col("event_type"), col("n").as("n_days"),
          col("S").cast("long").as("s_stat"),
          round((col("S") - signum(col("S"))) /
            sqrt(col("n") * (col("n") - 1.0) * (lit(2) * col("n") + 5) / 18), 6).as("z"))
        .orderBy(col("event_type"))
    }),

    // SoftDeDup-style fractional counting: a doc's weight is the mean
    // over its 8-token shingles of 1/df(shingle) — repeated passages
    // count once across the corpus instead of once per copy. Per-source
    // effective corpus size is what a sampler consumes.
    "dedup_soft_weights" -> ((s, dir) => {
      val tk = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), toks13.as("t"))
        .filter(size(col("t")) >= 8)
      val sh = tk.select(col("doc_id"), col("source"),
        explode(expr("transform(sequence(1, size(t) - 7), " +
          "i -> array_join(slice(t, i, 8), ' '))")).as("sh"))
      val df = sh.groupBy(col("sh"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val dw = sh.join(df, "sh")
        .groupBy(col("doc_id"), col("source"))
        .agg(round(avg(lit(1.0) / col("df")), 9).as("w"))
      dw.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("w")), 6).as("mean_weight"),
          round(sum(col("w")), 6).as("effective_docs"))
        .orderBy(col("source"))
    }),

    // Importance reweighting to a uniform language target: per-doc
    // weight = (N/L)/n_lang; the effective-sample-size ratio
    // (Σw)²/(N·Σw²) is the in-band health metric every reweighted
    // sampler monitors.
    "sample_importance" -> ((s, dir) => {
      val l = Tables.documents(s, dir)
        .groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      val t = l.agg(sum(col("nl")).as("n"), count(lit(1)).as("L"))
      val w = l.crossJoin(broadcast(t))
        .withColumn("wt", (col("n").cast("double") / col("L")) / col("nl"))
      val ess = w.agg((pow(sum(col("nl") * col("wt")), 2) /
        (sum(col("nl") * col("wt") * col("wt")) * max(col("n")))).as("ess"))
      w.crossJoin(broadcast(ess))
        .select(col("lang"), col("nl").as("n_docs"),
          round(col("wt"), 6).as("weight"),
          round(col("nl") * col("wt"), 6).as("weighted_mass"),
          round(col("ess"), 6).as("ess_ratio"))
        .orderBy(col("lang"))
    }),

    // Split-novelty audit: fraction of the validation split's DISTINCT
    // bigrams unseen in the train split, per language — the n-gram
    // overlap check run before trusting a held-out set.
    "text_ngram_novelty" -> ((s, dir) => {
      val tk = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1) < "8", "train")
            .otherwise("val").as("split"),
          toks13.as("t"))
        .filter(size(col("t")) >= 2)
      val bi = tk.select(col("lang"), col("split"),
        explode(expr("transform(sequence(1, size(t) - 1), " +
          "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("b"))
        .distinct()
      val v = bi.filter(col("split") === "val").select(col("lang"), col("b"))
      val tr = bi.filter(col("split") === "train")
        .select(col("lang"), col("b"), lit(1).as("seen"))
      v.join(tr, Seq("lang", "b"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_val_bigrams"),
          count(when(col("seen").isNull, 1)).as("n_novel"),
          round(count(when(col("seen").isNull, 1)).cast("double") /
            count(lit(1)), 6).as("novelty"))
        .orderBy(col("lang"))
    }),

    // Conversion latency: per converted user, seconds from first view
    // to the first purchase at-or-after it; median / p90 / mean.
    "events_funnel_time" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val p = e.join(v, "user_id")
        .filter(col("event_type") === "purchase" && col("ts") >= col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      v.join(p, "user_id")
        .select((unix_timestamp(col("t2")) - unix_timestamp(col("t1")))
          .cast("double").as("s"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(s, 0.5)"), 6).as("median_s"),
          round(expr("percentile(s, 0.9)"), 6).as("p90_s"),
          round(avg(col("s")), 6).as("mean_s"))
    }),

    // Distribution-position window: percent_rank over order totals
    // within each priority; the top decile's share of total spend.
    "win_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("pr", percent_rank().over(w))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(when(col("pr") >= 0.9, col("o_totalprice"))
              .otherwise(lit(0.0)).cast("decimal(18,2)"))
            .cast("double") /
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 6)
            .as("top_decile_share"))
        .orderBy(col("o_orderpriority"))
    }),

    // Eigenvector centrality on the co-purchase graph: 3 power
    // iterations x ← A·x / ‖A·x‖₂ from the uniform vector — the
    // prestige measure PageRank generalizes. One O(E) join + node agg
    // per iteration; the L2 norm is a 1-row broadcast.
    "graph_eigen_centrality" -> ((s, dir) => {
      val edges = AnalyticsQueries.edgesFull(s, dir)
        .repartition(col("src"))
        .cache()
      val nodes = edges.select(col("src").as("node")).distinct()
      val n0 = nodes.agg(sqrt(count(lit(1)).cast("double")).as("nr"))
      var x = nodes.crossJoin(broadcast(n0))
        .select(col("node"), (lit(1.0) / col("nr")).as("x"))
      for (_ <- 1 to 3) {
        val ax = edges
          .join(x.select(col("node").as("src"), col("x")), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("x")).as("ax"))
        val nr = ax.agg(sqrt(sum(col("ax") * col("ax"))).as("nr"))
        x = ax.crossJoin(broadcast(nr))
          .select(col("node"), (col("ax") / col("nr")).as("x"))
      }
      x.select(col("node").as("p_partkey"), round(col("x"), 6).as("centrality"))
        .orderBy(desc("centrality"), col("p_partkey"))
        .limit(20)
    })
  )

  val oracle: Map[String, String] = Map(

    "agg_gini" ->
      """WITH x AS (SELECT c_mktsegment AS seg, c_acctbal AS v, c_custkey AS k
        |  FROM customer WHERE c_acctbal > 0),
        |r AS (SELECT seg, v, row_number() OVER (PARTITION BY seg ORDER BY v, k) AS i,
        |             count(*) OVER (PARTITION BY seg) AS n,
        |             sum(v) OVER (PARTITION BY seg) AS s
        |      FROM x)
        |SELECT seg, CAST(max(n) AS BIGINT) AS n,
        |  round(sum((2.0*i - n - 1) * v) / (max(n) * max(s)), 6) AS gini
        |FROM r GROUP BY seg ORDER BY seg""".stripMargin,

    "agg_theil" ->
      """WITH x AS (SELECT c_mktsegment AS seg, c_acctbal AS v FROM customer
        |  WHERE c_acctbal > 0),
        |m AS (SELECT seg, avg(v) AS mu FROM x GROUP BY seg)
        |SELECT x.seg, CAST(count(*) AS BIGINT) AS n,
        |  round(avg((v/mu) * ln(v/mu)), 6) AS theil_t
        |FROM x JOIN m ON x.seg = m.seg GROUP BY x.seg ORDER BY x.seg""".stripMargin,

    "ts_mad_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    round(sum(value),6) AS x FROM events GROUP BY 1,2),
        |st AS (SELECT event_type, median(x) AS med FROM daily GROUP BY 1),
        |ad AS (SELECT daily.event_type, d, x, abs(x - med) AS dev
        |  FROM daily JOIN st USING (event_type)),
        |md AS (SELECT event_type, median(dev) AS mad FROM ad GROUP BY 1)
        |SELECT ad.event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(count(*) FILTER (0.6745*dev/mad > 3.5) AS BIGINT) AS n_anomalies,
        |  round(max(0.6745*dev/mad), 6) AS max_robust_z
        |FROM ad JOIN md USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin,

    "stat_power_twoprop" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)),1,1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN count(*) FILTER (event_type='purchase') >= 12
        |      THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |r AS (SELECT arm, count(*) AS n, avg(CAST(conv AS DOUBLE)) AS p
        |  FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm='A' THEN p END) AS pa,
        |    max(CASE WHEN arm='B' THEN p END) AS pb,
        |    max(CASE WHEN arm='A' THEN n END) AS na,
        |    max(CASE WHEN arm='B' THEN n END) AS nb FROM r)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(pa,6) AS p_a, round(pb,6) AS p_b,
        |  ceil(power(1.959964 * sqrt(2*((pa+pb)/2)*(1-(pa+pb)/2)) +
        |    0.841621 * sqrt(pa*(1-pa)+pb*(1-pb)), 2)
        |    / power(abs(pa-pb),2)) AS n_per_arm
        |FROM w""".stripMargin,

    "stat_quantile_ci" ->
      """WITH x AS (SELECT c_mktsegment AS seg, c_acctbal AS v, c_custkey AS k
        |  FROM customer),
        |r AS (SELECT seg, v, row_number() OVER (PARTITION BY seg ORDER BY v, k) AS i,
        |             count(*) OVER (PARTITION BY seg) AS n FROM x)
        |SELECT seg, CAST(max(n) AS BIGINT) AS n,
        |  round(median(v), 6) AS med,
        |  round(max(CASE WHEN i = CAST(floor(n/2.0 - 0.979982*sqrt(n)) AS BIGINT)
        |    THEN v END), 6) AS ci_lo,
        |  round(max(CASE WHEN i = CAST(ceil(n/2.0 + 1 + 0.979982*sqrt(n)) AS BIGINT)
        |    THEN v END), 6) AS ci_hi
        |FROM r GROUP BY seg ORDER BY seg""".stripMargin,

    "stat_mann_kendall" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    round(sum(value),6) AS x FROM events GROUP BY 1,2),
        |p AS (SELECT a.event_type, sign(b.x - a.x) AS sg
        |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d),
        |s AS (SELECT event_type, sum(sg) AS S FROM p GROUP BY 1),
        |n AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
        |SELECT s.event_type, CAST(n AS BIGINT) AS n_days, CAST(S AS BIGINT) AS s_stat,
        |  round((S - sign(S)) / sqrt(n*(n-1.0)*(2*n+5)/18), 6) AS z
        |FROM s JOIN n USING (event_type) ORDER BY 1""".stripMargin,

    "dedup_soft_weights" ->
      """WITH tk AS (SELECT doc_id, source,
        |    list_filter(string_split(text,' '), x->x<>'') AS t FROM documents),
        |s AS (SELECT doc_id, source, unnest(list_transform(range(1, len(t)-7+1),
        |        i -> array_to_string(t[i:i+7], ' '))) AS sh
        |  FROM tk WHERE len(t) >= 8),
        |df AS (SELECT sh, count(DISTINCT doc_id) AS df FROM s GROUP BY 1),
        |dw AS (SELECT doc_id, source, round(avg(1.0/df), 9) AS w
        |  FROM s JOIN df USING (sh) GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(w), 6) AS mean_weight, round(sum(w), 6) AS effective_docs
        |FROM dw GROUP BY source ORDER BY source""".stripMargin,

    "sample_importance" ->
      """WITH l AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
        |t AS (SELECT count(*) AS n, count(DISTINCT lang) AS L FROM documents),
        |w AS (SELECT lang, nl, (CAST(n AS DOUBLE)/L)/nl AS wt FROM l CROSS JOIN t)
        |SELECT lang, CAST(nl AS BIGINT) AS n_docs, round(wt, 6) AS weight,
        |  round(nl*wt, 6) AS weighted_mass,
        |  round(power((SELECT sum(nl*wt) FROM w), 2) /
        |    ((SELECT sum(nl*wt*wt) FROM w) * (SELECT n FROM t)), 6) AS ess_ratio
        |FROM w ORDER BY lang""".stripMargin,

    "text_ngram_novelty" ->
      """WITH tk AS (SELECT doc_id, lang,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,1) < '8'
        |      THEN 'train' ELSE 'val' END AS split,
        |    list_filter(string_split(text,' '), x->x<>'') AS t FROM documents),
        |bi AS (SELECT DISTINCT lang, split, unnest(list_transform(range(1, len(t)),
        |        i -> t[i] || ' ' || t[i+1])) AS b FROM tk WHERE len(t) >= 2),
        |v AS (SELECT lang, b FROM bi WHERE split = 'val'),
        |tr AS (SELECT lang, b FROM bi WHERE split = 'train')
        |SELECT v.lang, CAST(count(*) AS BIGINT) AS n_val_bigrams,
        |  CAST(count(*) FILTER (tr.b IS NULL) AS BIGINT) AS n_novel,
        |  round(CAST(count(*) FILTER (tr.b IS NULL) AS DOUBLE)/count(*), 6) AS novelty
        |FROM v LEFT JOIN tr ON v.lang = tr.lang AND v.b = tr.b
        |GROUP BY v.lang ORDER BY v.lang""".stripMargin,

    "events_funnel_time" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type='view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
        |  WHERE event_type='purchase' AND ts >= t1 GROUP BY 1),
        |dt AS (SELECT v.user_id, CAST(date_diff('second', t1, t2) AS DOUBLE) AS s
        |  FROM v JOIN p ON v.user_id = p.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |  round(median(s), 6) AS median_s,
        |  round(quantile_cont(s, 0.9), 6) AS p90_s,
        |  round(avg(s), 6) AS mean_s FROM dt""".stripMargin,

    "win_percent_rank" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(CASE WHEN pr >= 0.9 THEN tp ELSE 0.0 END
        |      AS DECIMAL(18,2))) AS DOUBLE) /
        |    CAST(sum(CAST(tp AS DECIMAL(18,2))) AS DOUBLE), 6) AS top_decile_share
        |FROM (SELECT o_orderpriority, o_totalprice AS tp,
        |    percent_rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS pr
        |  FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_eigen_centrality" ->
      """WITH le AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT a.pk AS src, b.pk AS dst
        |  FROM le a JOIN le b ON a.ok = b.ok AND a.pk <> b.pk),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT sqrt(CAST(count(*) AS DOUBLE)) AS nr FROM nodes),
        |x0 AS (SELECT node, 1.0 / nr AS x FROM nodes CROSS JOIN nn),
        |a1 AS (SELECT e.dst AS node, sum(p.x) AS ax FROM edges e
        |  JOIN x0 p ON e.src = p.node GROUP BY 1),
        |n1 AS (SELECT sqrt(sum(ax*ax)) AS nr FROM a1),
        |x1 AS (SELECT node, ax / nr AS x FROM a1 CROSS JOIN n1),
        |a2 AS (SELECT e.dst AS node, sum(p.x) AS ax FROM edges e
        |  JOIN x1 p ON e.src = p.node GROUP BY 1),
        |n2 AS (SELECT sqrt(sum(ax*ax)) AS nr FROM a2),
        |x2 AS (SELECT node, ax / nr AS x FROM a2 CROSS JOIN n2),
        |a3 AS (SELECT e.dst AS node, sum(p.x) AS ax FROM edges e
        |  JOIN x2 p ON e.src = p.node GROUP BY 1),
        |n3 AS (SELECT sqrt(sum(ax*ax)) AS nr FROM a3),
        |x3 AS (SELECT node, ax / nr AS x FROM a3 CROSS JOIN n3)
        |SELECT node AS p_partkey, round(x, 6) AS centrality
        |FROM x3 ORDER BY centrality DESC, p_partkey LIMIT 20""".stripMargin
  )
}
