package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-build flagship: ONE declared lineage chaining the
  * training-data stages every LLM corpus runs, each reusing the engine's
  * existing op (graft.api.DedupOps / the gate shapes the single-stage keys
  * grade in isolation):
  *
  *   normalize → exact dedup (md5, min-id survivor)
  *             → near-dedup keep-list (sampled-spine strong pairs, J ≥ 0.9)
  *             → Gopher quality gate (length / word-shape / symbol /
  *               stopword rules)
  *             → unigram-LM perplexity gate (mean-offset threshold —
  *               aggregates only, NO per-lang percentile funnel)
  *             → benchmark-contamination anti-join (5-token shingles of
  *               the doc_id % 19 eval split, broadcast)
  *             → chunk (window 8 / stride 4) + pack (budget 64, 8 shards)
  *             → per-shard manifest with the full funnel disclosed
  *
  * Output: 8 manifest rows (shard, docs/chunks/tokens/packs) each carrying
  * the funnel counts n_raw → n_clean, so the whole lineage is auditable
  * from the result alone.
  *
  * Scale shape (the point of the key): every stage is linear —
  * - exact dedup: one hash groupBy;
  * - near-dedup: the md5-group SAMPLED pair spine (~n·62 intra-group
  *   pairs, content-hash deterministic, the round-13 discipline that
  *   keeps the exact ground truth oracle-replayable while the full pair
  *   graph stays off-plan);
  * - both gates: per-doc projections + one token-count shuffle with
  *   map-side combine; the perplexity threshold is a per-lang MEAN (a
  *   broadcast 1-row-per-lang join), deliberately not a percentile —
  *   percent_rank would funnel each lang through one partition;
  * - contamination: the eval side is small by construction and
  *   broadcasts; the corpus side never shuffles before the anti-join;
  * - packing: per-shard cumsum windows — shard count is the scale-out
  *   knob (8 here; thousands in production).
  * Stage frames are pinned with localCheckpoint (not cache) because each
  * feeds both its successor and a funnel count — the lineage stays flat
  * and the blocks are GC-reclaimed when the query ends.
  */
object PipelineQueries {

  private val stopwords = Seq("the", "of", "and", "to", "a", "in", "is")

  val queries: Map[String, Q] = Map(
    "pipeline_corpus_build" -> ((s, dir) => {
      val raw = Tables.documents(s, dir)
      val prefLen = graft.api.DedupOps.samplePrefixLen(raw.count())

      // 1. normalize: lowercase, collapse runs of spaces, trim
      val norm = raw.select(col("doc_id"), col("lang"),
          trim(regexp_replace(lower(col("text")), " +", " ")).as("text"))
        .localCheckpoint(true)
      val nRaw = norm.agg(count(lit(1)).as("n_raw"))

      // 2. exact dedup: min doc_id survives each md5(text) group
      val exIds = graft.api.DedupOps.exact(
        norm.withColumn("h", md5(col("text").cast("binary"))), "h", "doc_id")
        .select(col("doc_id"))
      val e = norm.join(exIds, "doc_id").localCheckpoint(true)
      val nExact = e.agg(count(lit(1)).as("n_exact"))

      // 3. near-dedup keep-list: sampled-spine strong pairs (J ≥ 0.9,
      // intra-md5-group — linear pair volume, engine-replayable), drop
      // every doc with a LOWER-id strong neighbor
      val dropNear = graft.api.DedupOps.nearJaccardPairsSampled(
          e, "doc_id", "text", num = 9, den = 10, prefLen = prefLen)
        .select(col("id_b").as("doc_id")).distinct()
      val n = e.join(dropNear, Seq("doc_id"), "left_anti").localCheckpoint(true)
      val nNear = n.agg(count(lit(1)).as("n_near"))

      // 4. Gopher gate on ROUNDED metrics (6dp both engines, so the
      // boundary comparisons are deterministic cross-engine)
      val words = split(col("text"), " ")
      val nWords = size(words)
      val g = n.select(col("doc_id"), col("lang"), col("text"),
          nWords.as("n_words"),
          round(length(regexp_replace(col("text"), " ", "")).cast("double")
            / nWords, 6).as("mwl"),
          round(length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))
            .cast("double") / nWords, 6).as("sym"),
          round(size(filter(words, w => w.isin(stopwords: _*))).cast("double")
            / nWords, 6).as("stop"))
        .filter(col("n_words") >= 30 && col("mwl").between(3.8, 10.0) &&
          col("sym") <= 0.1 && col("stop") > 0.02)
        .select(col("doc_id"), col("lang"), col("text"))
        .localCheckpoint(true)
      val nGopher = g.agg(count(lit(1)).as("n_gopher"))

      // 5. perplexity gate: unigram LM over the gate-4 survivors; keep
      // docs with mean log-prob ≥ lang mean − 0.03 (the unigram lp
      // distribution is tight — std ~0.02-0.04 — so the offset cuts a
      // real ~5-10% low-probability tail). Aggregates only —
      // the count table broadcasts, the threshold is a per-lang 1-row
      // join; no percentile window, no single-partition funnel.
      val tok = g.select(col("doc_id"), col("lang"),
          explode(words).as("tok"))
        .filter(col("tok") =!= "")
      val counts = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val total = counts.agg(sum(col("c")).as("total"))
      val lp = tok.join(broadcast(counts), "tok")
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"), col("lang"))
        .agg(round(sum(round(log(col("c").cast("double") / col("total")), 9))
          / count(lit(1)), 6).as("lp"))
      val mlp = lp.groupBy(col("lang"))
        .agg(round(avg(col("lp")), 6).as("mlp"))
      val p = g.join(lp.join(broadcast(mlp), "lang")
          .filter(col("lp") >= col("mlp") - 0.03)
          .select(col("doc_id")), "doc_id")
        .localCheckpoint(true)
      val nPpl = p.agg(count(lit(1)).as("n_ppl"))

      // 6. contamination: any train doc sharing a 5-token shingle with
      // the doc_id % 19 eval split is dropped (eval docs themselves
      // leave the train side here too). Both joins are EQUI: the eval
      // shingle set broadcasts, the train shingles probe it with a
      // broadcast semi-join (→ contaminated ids), then one anti-join —
      // never a per-shingle non-equi scan of the corpus.
      def shingleRows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), words.as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 5), i -> array_join(slice(t, i + 1, 5), ' '))"))
          .as("sh"))
      val benchSh = shingleRows(norm.filter(col("doc_id") % 19 === 0))
        .select(col("sh")).distinct()
      val train = p.filter(col("doc_id") % 19 =!= 0)
      val contaminated = shingleRows(train)
        .join(broadcast(benchSh), "sh")
        .select(col("doc_id")).distinct()
      val c = train.join(contaminated, Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val nClean = c.agg(count(lit(1)).as("n_clean"))

      // 7. chunk (window 8 / stride 4) + pack (budget 64) per shard
      val ch = c.select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, size(toks) - 1, 4)")).as("st"))
        .select(col("doc_id"), col("st").cast("long").as("start"),
          size(expr("slice(toks, st + 1, 8)")).as("n_chunk_toks"))
        .withColumn("shard", col("doc_id") % 8)
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"), col("start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val packed = ch
        .withColumn("cum_before",
          sum(col("n_chunk_toks")).over(w) - col("n_chunk_toks"))
        .withColumn("pack_id", floor(col("cum_before") / 64).cast("long"))

      // 8. shard manifest + the funnel constants
      val funnel = nRaw.crossJoin(nExact).crossJoin(nNear)
        .crossJoin(nGopher).crossJoin(nPpl).crossJoin(nClean)
      packed.groupBy(col("shard"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("n_chunk_toks")).as("n_tokens"),
          countDistinct(col("pack_id")).as("n_packs"))
        .crossJoin(broadcast(funnel))
        .orderBy(col("shard"))
    })
  )

  val oracle: Map[String, String] = Map(
    "pipeline_corpus_build" ->
      """WITH norm AS MATERIALIZED (
        |  SELECT doc_id, lang,
        |    trim(regexp_replace(lower(text), ' +', ' ', 'g')) AS text
        |  FROM documents),
        |pl AS (
        |  SELECT CASE WHEN count(*) <= 2000 THEN 1
        |              WHEN count(*) <= 32000 THEN 2
        |              WHEN count(*) <= 512000 THEN 3 ELSE 4 END AS p
        |  FROM documents),
        |ex AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY md5(text)),
        |e AS MATERIALIZED (SELECT n.* FROM norm n JOIN ex USING (doc_id)),
        |dd AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(str_split(text, ' ')) AS ts,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, (SELECT p FROM pl)) AS grp
        |  FROM e),
        |drop_near AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM dd a JOIN dd b
        |    ON a.grp = b.grp AND a.doc_id < b.doc_id
        |    AND len(b.ts) * 10 >= len(a.ts) * 9
        |    AND len(a.ts) * 10 >= len(b.ts) * 9
        |    AND len(list_intersect(a.ts, b.ts)) * 10 >=
        |        (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts))) * 9),
        |nr AS (SELECT e.* FROM e WHERE doc_id NOT IN (SELECT doc_id FROM drop_near)),
        |gm AS (
        |  SELECT doc_id, lang, text,
        |    len(str_split(text, ' ')) AS n_words,
        |    round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / len(str_split(text, ' ')), 6) AS mwl,
        |    round(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |      / len(str_split(text, ' ')), 6) AS sym,
        |    round(CAST(len(list_filter(str_split(text, ' '),
        |        w -> w IN ('the','of','and','to','a','in','is'))) AS DOUBLE)
        |      / len(str_split(text, ' ')), 6) AS stop
        |  FROM nr),
        |g AS MATERIALIZED (
        |  SELECT doc_id, lang, text FROM gm
        |  WHERE n_words >= 30 AND mwl BETWEEN 3.8 AND 10.0
        |    AND sym <= 0.1 AND stop > 0.02),
        |tok AS (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok FROM g),
        |t2 AS (SELECT * FROM tok WHERE tok <> ''),
        |cnt AS (SELECT tok, count(*) AS c FROM t2 GROUP BY tok),
        |tot AS (SELECT sum(c) AS total FROM cnt),
        |lp AS (
        |  SELECT doc_id, lang,
        |    round(sum(round(ln(c / CAST(total AS DOUBLE)), 9)) / count(*), 6) AS lp
        |  FROM t2 JOIN cnt USING (tok) CROSS JOIN tot
        |  GROUP BY doc_id, lang),
        |mlp AS (SELECT lang, round(avg(lp), 6) AS mlp FROM lp GROUP BY lang),
        |p AS MATERIALIZED (
        |  SELECT g.* FROM g
        |    JOIN lp USING (doc_id) JOIN mlp ON mlp.lang = lp.lang
        |  WHERE lp.lp >= mlp.mlp - 0.03),
        |bench_sh AS MATERIALIZED (
        |  SELECT DISTINCT unnest(list_transform(
        |      generate_series(0, len(str_split(text, ' ')) - 5),
        |      i -> array_to_string(list_slice(str_split(text, ' '), i + 1, i + 5), ' '))) AS sh
        |  FROM norm WHERE doc_id % 19 = 0 AND len(str_split(text, ' ')) >= 5),
        |train_sh AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(0, len(str_split(text, ' ')) - 5),
        |      i -> array_to_string(list_slice(str_split(text, ' '), i + 1, i + 5), ' '))) AS sh
        |  FROM p WHERE doc_id % 19 <> 0 AND len(str_split(text, ' ')) >= 5),
        |contam AS (SELECT DISTINCT doc_id FROM train_sh JOIN bench_sh USING (sh)),
        |c AS MATERIALIZED (
        |  SELECT p.* FROM p
        |  WHERE doc_id % 19 <> 0
        |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM c),
        |st AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, len(toks) - 1, 4)) AS start
        |  FROM t),
        |ch AS (
        |  SELECT doc_id, start,
        |    len(list_slice(toks, start + 1, start + 8)) AS n_chunk_toks,
        |    doc_id % 8 AS shard
        |  FROM st),
        |packed AS (
        |  SELECT shard, doc_id, n_chunk_toks,
        |    CAST(sum(n_chunk_toks) OVER (PARTITION BY shard
        |      ORDER BY doc_id, start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - n_chunk_toks AS cum_before
        |  FROM ch),
        |funnel AS (
        |  SELECT CAST((SELECT count(*) FROM norm) AS BIGINT) AS n_raw,
        |    CAST((SELECT count(*) FROM e) AS BIGINT) AS n_exact,
        |    CAST((SELECT count(*) FROM nr) AS BIGINT) AS n_near,
        |    CAST((SELECT count(*) FROM g) AS BIGINT) AS n_gopher,
        |    CAST((SELECT count(*) FROM p) AS BIGINT) AS n_ppl,
        |    CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clean)
        |SELECT shard, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(n_chunk_toks) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT CAST(floor(cum_before / 64) AS BIGINT)) AS BIGINT) AS n_packs,
        |  n_raw, n_exact, n_near, n_gopher, n_ppl, n_clean
        |FROM packed CROSS JOIN funnel
        |GROUP BY shard, n_raw, n_exact, n_near, n_gopher, n_ppl, n_clean
        |ORDER BY shard""".stripMargin
  )
}
