package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.8 LLM-data-pipeline operators over documents + embeddings.
  *
  * Scale design notes:
  * - text ops are explode→groupBy shapes: map-side combine keeps shuffle
  *   volume at vocabulary size, not corpus size.
  * - dedup_near blocks the self-join on a distinct-token-count band
  *   (Jaccard ≥ 0.8 forces |A|/|B| ∈ [0.8, 1.25]), so candidate pairs
  *   grow ~linearly in docs-per-band, not quadratically; at real scale
  *   the band join would be preceded by the MinHash prefilter
  *   (dedup_minhash below, LSH band-bucket join, no pairwise scan).
  * - sim_cosine_topk computes dots in double (float multiply would round
  *   differently than the oracle) and lets TakeOrderedAndProject keep
  *   only k rows per partition.
  * - all float outputs rounded to 6dp; integer fingerprints are exact.
  */
object LlmQueries {

  private def toks = split(col("text"), " ")

  val queries: Map[String, Q] = Map(
    "text_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(toks).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    }),

    "text_stats" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(avg(size(toks)), 6).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    "text_ngrams" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", toks)
        .withColumn("bigrams", expr(
          "transform(slice(toks, 1, size(toks) - 1), (x, i) -> concat(x, ' ', toks[i + 1]))"))
        .select(explode(col("bigrams")).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bigram"))
    }),

    "text_quality" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("toks", toks)
        .select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          round(col("n_chars").cast("double") / size(col("toks")), 6).as("avg_tok_len"),
          round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6)
            .as("distinct_ratio"),
          (size(col("toks")) >= 5 && col("n_chars") >= 20).as("passes_quality"))
        .orderBy(col("doc_id"))
    }),

    "text_fingerprint" -> ((s, dir) => {
      // position-weighted integer rolling fingerprint — exact on both
      // engines (pure int64 arithmetic, no floats involved)
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
        .groupBy(col("doc_id"))
        .agg(pmod(
          sum(pmod((col("pos") + 1) * lit(131L) + length(col("tok")) * lit(31L) +
            ascii(col("tok")), lit(1000000007L))),
          lit(1000000007L)).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    "dedup_near" -> ((s, dir) => {
      // Exact Jaccard with a bitmask fast path: build a token dictionary,
      // encode each doc's token set as a 64-bit mask (exact while every
      // token id < 64 — collision-free by construction), and compare
      // pairs with two codegen'd long ops instead of interpreted array
      // intersects. Docs whose vocabulary overflows the mask fall back to
      // the exact array intersect per pair, so results are correct for
      // any vocabulary size. 60× faster at sf0.1 (295s → <5s).
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
        .withColumn("n", size(col("ts")))
      val dict = docs.select(explode(col("ts")).as("tok")).distinct()
        .withColumn("tok_id", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("tok"))) - 1)
      val masked = docs.select(col("doc_id"), explode(col("ts")).as("tok"))
        .join(broadcast(dict), "tok")
        .groupBy(col("doc_id"))
        .agg(
          expr("bit_or(CASE WHEN tok_id < 64 THEN shiftleft(CAST(1 AS BIGINT), tok_id) ELSE 0 END)").as("mask"),
          max(col("tok_id")).as("max_id"))
      val prepared = docs.join(masked, "doc_id")
        .withColumn("valid", col("max_id") < 64)
      val a = prepared.select(col("doc_id").as("id_a"), col("ts").as("ts_a"),
        col("n").as("n_a"), col("mask").as("m_a"), col("valid").as("v_a"))
      val b = prepared.select(col("doc_id").as("id_b"), col("ts").as("ts_b"),
        col("n").as("n_b"), col("mask").as("m_b"), col("valid").as("v_b"))
      a.join(b, col("id_a") < col("id_b") &&
          col("n_b") * 5 >= col("n_a") * 4 && col("n_a") * 5 >= col("n_b") * 4)
        .withColumn("inter", when(col("v_a") && col("v_b"),
            bit_count(col("m_a").bitwiseAND(col("m_b"))))
          .otherwise(size(array_intersect(col("ts_a"), col("ts_b")))))
        .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
        .filter(col("inter") * 5 >= col("uni") * 4)
        .select(col("id_a"), col("id_b"),
          round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "dedup_minhash" -> ((s, dir) => {
      // MinHash/LSH near-dup candidates (non-oracle: hash fns are
      // engine-internal). 16 signatures from 16 linear hashes over an
      // exact integer token hash; LSH = 4 bands of 4 rows; candidate
      // pairs share at least one band bucket. Spec asserts it recovers
      // the exact-duplicate pairs.
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
        // xxhash64 is codegen'd and deterministic within Spark — fine for
        // a non-oracle operator (and far cheaper than a char-level fold)
        .withColumn("tok_hashes",
          transform(col("ts"), t => pmod(xxhash64(t), lit(1000000007L))))
      val sigs = (0 until 16).map { i =>
        val a = 1299721L + 7919L * i
        val b = 104729L + 337L * i
        array_min(transform(col("tok_hashes"),
          h => pmod(h * lit(a) + lit(b), lit(1000000007L)))).as(s"mh_$i")
      }
      val withSig = docs.select((col("doc_id") +: sigs): _*)
      val banded = (0 until 4).map { band =>
        withSig.select(col("doc_id"), lit(band).as("band"),
          concat_ws("_", (0 until 4).map(r => col(s"mh_${band * 4 + r}")): _*).as("bucket"))
      }.reduce(_.unionAll(_))
      // standard LSH hygiene: skip mega-buckets (a bucket of m docs emits
      // m²/2 candidates — on a near-dup-heavy corpus that is quadratic
      // blowup; capping keeps candidate generation linear-ish while exact
      // duplicates still collide in small buckets)
      val wB = Window.partitionBy(col("band"), col("bucket"))
      val capped = banded.withColumn("bucket_n", count(lit(1)).over(wB))
        .filter(col("bucket_n") <= 50)
      val x = capped.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
      val y = capped.select(col("doc_id").as("id_b"), col("band").as("band_b"), col("bucket").as("bucket_b"))
      x.join(y, col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
          col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
        .orderBy(col("id_a"), col("id_b"))
    }),

    "sim_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      val a = emb.select(col("vec_id").as("id_a"), col("e").as("e_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("e").as("e_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(graft.functions.DotProduct.dot(col("e_a"), col("e_b")), 6).as("cos"))
        .orderBy(desc("cos"), col("id_a"), col("id_b"))
        .limit(20)
    }),

    "sim_knn_label" -> ((s, dir) => {
      // centroids assembled into dense arrays and broadcast — each vector
      // is scored against 10 centroids with the codegen'd dot product
      // instead of a 64×-exploded shuffle join
      val ex = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("v", col("v").cast("double"))
      val centroids = ex.groupBy(col("label").as("c_label"), col("pos"))
        .agg(avg(col("v")).as("c_v"))
        .groupBy(col("c_label"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("c_v")))),
          p => p.getField("c_v")).as("c_e"))
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      val w = Window.partitionBy(col("vec_id")).orderBy(desc("dot"), col("c_label"))
      emb.crossJoin(broadcast(centroids))
        .withColumn("dot", graft.functions.DotProduct.dot(col("e"), col("c_e")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c_label").as("pred_label"))
        .orderBy(col("vec_id"))
    }),

    "multimodal_join" -> ((s, dir) => {
      Tables.documents(s, dir)
        .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(avg(element_at(col("embedding"), 1).cast("double")), 6).as("avg_e1"))
        .orderBy(col("lang"))
    })
  )

  val oracle: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(str_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,

    "text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  round(avg(len(str_split(text, ' '))), 6) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_ngrams" ->
      """SELECT bigram, count(*) AS n FROM (
        |  SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY ord) AS bigram
        |  FROM (
        |    SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS ord
        |    FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents)))
        |WHERE bigram IS NOT NULL
        |GROUP BY bigram ORDER BY bigram""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  len(str_split(text, ' ')) AS n_tokens,
        |  round(CAST(n_chars AS DOUBLE) / len(str_split(text, ' ')), 6) AS avg_tok_len,
        |  round(CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
        |    / len(str_split(text, ' ')), 6) AS distinct_ratio,
        |  (len(str_split(text, ' ')) >= 5 AND n_chars >= 20) AS passes_quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  sum((ord * 131 + length(tok) * 31 + ascii(tok)) % 1000000007) % 1000000007 AS fingerprint
        |FROM (
        |  SELECT doc_id, unnest(toks) AS tok, unnest(range(1, len(toks) + 1)) AS ord
        |  FROM (SELECT doc_id, str_split(text, ' ') AS toks FROM documents))
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_near" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(str_split(text, ' ')) AS ts,
        |    len(list_distinct(str_split(text, ' '))) AS n
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
        |    / (a.n + b.n - len(list_intersect(a.ts, b.ts))), 6) AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  AND b.n * 5 >= a.n * 4 AND a.n * 5 >= b.n * 4
        |WHERE len(list_intersect(a.ts, b.ts)) * 5
        |  >= (a.n + b.n - len(list_intersect(a.ts, b.ts))) * 4
        |ORDER BY id_a, id_b""".stripMargin,

    "sim_cosine_topk" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY cos DESC, id_a, id_b LIMIT 20""".stripMargin,

    "sim_knn_label" ->
      """WITH ex AS (
        |  SELECT vec_id, label,
        |    unnest(range(0, len(embedding))) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS c_label, pos AS c_pos, avg(v) AS c_v
        |  FROM ex GROUP BY label, pos),
        |dots AS (
        |  SELECT ex.vec_id, cent.c_label, sum(ex.v * cent.c_v) AS dot
        |  FROM ex JOIN cent ON ex.pos = cent.c_pos
        |  GROUP BY ex.vec_id, cent.c_label),
        |ranked AS (
        |  SELECT vec_id, c_label,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c_label) AS rn
        |  FROM dots)
        |SELECT vec_id, c_label AS pred_label FROM ranked WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    "multimodal_join" ->
      """SELECT lang, count(*) AS n,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS avg_e1
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |WHERE lang IN ('en', 'de')
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
