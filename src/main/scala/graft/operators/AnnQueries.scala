package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Similarity search & fingerprint dedup beyond the brute-force baseline.
  *
  * - emb_neardup: all pairs with cosine ≥ 0.45 (oracle-checked). Same
  *   blocking caveat as any threshold join: at 100 TB this runs behind
  *   the IVF bucketing below, never as a raw cross join.
  * - sim_ann_ivf: IVF-style ANN. Coarse quantizer = the first 8 vectors
  *   (deterministic seeds); every vector is assigned to its nearest seed
  *   (one shuffle on bucket id), then top-k search runs only within the
  *   query vector's bucket (nprobe=1). Candidate set shrinks ~8× here,
  *   ~#buckets× in general; recall measured against brute force in the
  *   spec. Non-oracle: result depends on the engine-side argmin order.
  * - dedup_simhash: 32-bit SimHash over exact integer token hashes; docs
  *   within 2 bits Hamming distance pair up via 4-band bucketing (full
  *   recall ≤ 3 bits by pigeonhole, exact verify via bit_count(xor)).
  *   Non-oracle; spec asserts exact AND near duplicates collide and
  *   distinct docs don't (at test scale).
  */
object AnnQueries {

  private def dotDouble(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.DotProduct.dot(a, b)

  private def embDouble(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("e"))

  val queries: Map[String, Q] = Map(
    // §2.10 expr_custom: the fused codegen DotProduct expression driven
    // directly — self-similarity of unit vectors (≈1.0), oracle-checked
    "expr_custom" -> ((s, dir) => {
      embDouble(s, dir)
        .select(col("vec_id"), round(dotDouble(col("e"), col("e")), 6).as("self_cos"))
        .orderBy(col("vec_id"))
    }),

    "emb_neardup" -> ((s, dir) =>
      graft.api.SimilarityOps.nearDupPairs(
          Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),

    // SRP-LSH bucketed variant of emb_neardup — the 100 TB path: banded
    // signature buckets generate candidates, exact codegen dot verifies.
    // Corpus-sized geometry (lshNearDupPairsAuto): bucket width grows
    // with log(n) so candidates stay linear — the fixed 16-bit/4-band
    // geometry measured quadratic at 10x sf0.1 (ScaleBench). Non-oracle
    // (recall is probabilistic); spec asserts subset-of-exact precision
    // and a recall floor against emb_neardup.
    "emb_neardup_lsh" -> ((s, dir) =>
      graft.api.SimilarityOps.lshNearDupPairsAuto(
          Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.45)
        .orderBy(col("id_a"), col("id_b"))),

    "sim_ann_ivf" -> ((s, dir) =>
      graft.api.SimilarityOps.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          queryPred = col("vec_id") < 10, numSeeds = 8, k = 5)
        .orderBy(col("q_id"), col("rank"))),

    // trained coarse quantizer + multi-probe: Lloyd-iterated k-means
    // centroids (cosine), queries probe their 2 nearest clusters —
    // recall strictly >= the seed-bucket nprobe=1 variant above.
    // One declared Lloyd iteration: each iteration is a full
    // assign+mean job chain (the suite's most contention-exposed shape);
    // convergence over more iters is spec territory, not the demo's.
    "sim_ann_kmeans" -> ((s, dir) =>
      graft.api.SimilarityOps.kmeansIvfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          queryPred = col("vec_id") < 10, k = 5, nClusters = 8, iters = 1, nprobe = 2)
        .orderBy(col("q_id"), col("rank"))),

    // int8 symmetric quantization (scale 127 — valid because vectors are
    // unit-norm, so |v| <= 1): 4x smaller vectors for the ANN candidate
    // pass, exact re-rank stays on the float column. floor(x*127 + 0.5)
    // instead of round() — identical IEEE ops in both engines, no
    // round-half-mode ambiguity. max_err <= 1/254 by construction.
    "emb_quantize" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .withColumn("q", expr(
          "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 127 + 0.5) AS INT))"))
        .select(col("vec_id"),
          array_join(col("q").cast("array<string>"), ",").as("q_csv"),
          round(expr(
            """aggregate(
              |  zip_with(embedding, q, (v, qi) -> abs(CAST(v AS DOUBLE) - CAST(qi AS DOUBLE) / 127)),
              |  CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, x))""".stripMargin), 6).as("max_err"))
        .orderBy(col("vec_id"))
    }),

    "dedup_simhash" -> ((s, dir) =>
      graft.api.DedupOps.simhashPairs(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))),

    // 64-bit twin of dedup_simhash — the width that keeps banding linear
    // past ~25k docs (2^16 buckets per band vs 2^8; ScaleBench measured
    // the 32-bit geometry at ~12x for 10x data, the ceiling the comment
    // in DedupOps.simhashPairs documents). Same 4-band pigeonhole recall
    // guarantee; the Hamming ball is tighter at 64 bits, so pairs are a
    // subset of the 32-bit pairs (spec-asserted: bits 0-31 coincide).
    "dedup_simhash64" -> ((s, dir) =>
      graft.api.DedupOps.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
          bits = 64)
        .orderBy(col("id_a"), col("id_b"))),

    // weighted char-n-gram frequency scorer — continuous per-doc scores.
    // NOTE the synthetic corpus's lang label is independent of its text
    // (one shared vocabulary; every token's lang share ≈ base rate), so
    // majority-class accuracy is the ceiling here; discriminative power
    // is spec-tested on language-correlated text (AnnSpec).
    "text_langid" -> ((s, dir) =>
      Tables.documents(s, dir).withColumnRenamed("lang", "true_lang")
        .transform(d => graft.api.TextOps.langId(d, "doc_id", "text")
          .join(d.select(col("doc_id"), col("true_lang")), "doc_id"))
        .select(col("doc_id"), col("true_lang"), col("pred_lang"),
          round(col("pred_score"), 6).as("pred_score"))
        .orderBy(col("doc_id")))
  )

  val oracle: Map[String, String] = Map(
    "expr_custom" ->
      """SELECT vec_id,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), 6) AS self_cos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "emb_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 127 + 0.5) AS INT)) AS qs
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(qs, ',') AS q_csv,
        |  round(list_aggregate(list_transform(range(1, 65),
        |    i -> abs(CAST(embedding[i] AS DOUBLE) - CAST(qs[i] AS DOUBLE) / 127)),
        |    'max'), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "emb_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 6) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin
  )
}
