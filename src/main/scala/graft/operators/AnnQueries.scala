package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
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
  *   whose signatures agree are dup candidates. Non-oracle; spec asserts
  *   exact duplicates collide and distinct docs don't (at test scale).
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

    "emb_neardup" -> ((s, dir) => {
      val emb = embDouble(s, dir)
      val a = emb.select(col("vec_id").as("id_a"), col("e").as("e_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("e").as("e_b"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(dotDouble(col("e_a"), col("e_b")), 6).as("cos"))
        // `|| rand() > 2` is always false but marks the predicate
        // nondeterministic, so Catalyst can't push it into the join
        // condition — without it the dot product runs twice per pair
        // (once interpreted inside the BNLJ predicate): 76s → 5s at sf0.1
        .filter(col("cos") >= 0.45 || rand() > lit(2))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "sim_ann_ivf" -> ((s, dir) => {
      val emb = embDouble(s, dir)
      // coarse quantizer: first 8 vectors are the bucket centroids
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("seed_id"), col("e").as("seed_e"))
      val wAssign = Window.partitionBy(col("vec_id")).orderBy(desc("seed_dot"), col("seed_id"))
      val assigned = emb.crossJoin(broadcast(seeds))
        .withColumn("seed_dot", dotDouble(col("e"), col("seed_e")))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("e"), col("seed_id").as("bucket"))
      // queries = first 10 vectors; search only inside their bucket
      val q = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("e").as("q_e"), col("bucket"))
      val wTop = Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("vec_id"))
      q.join(assigned, Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", round(dotDouble(col("q_e"), col("e")), 6))
        .withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").as("rank"), col("vec_id").as("neighbor_id"), col("cos"))
        .orderBy(col("q_id"), col("rank"))
    }),

    "dedup_simhash" -> ((s, dir) => {
      // exact integer polynomial hash per token (same one both spec data
      // and dedup_minhash use), then 32-bit sign-aggregated SimHash
      val tokHashed = Tables.documents(s, dir)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
        .withColumn("h", pmod(xxhash64(col("tok")), lit(1000000007L)))
      val bitCols = (0 until 32).map { i =>
        // weight +1 if bit i of a mixed hash is set, else -1
        sum(when(expr(s"pmod(h DIV ${1L << (i % 20)} + h * ${2 * i + 1}, 2)") === 1, 1)
          .otherwise(-1)).as(s"b_$i")
      }
      val sig = tokHashed.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
        .select(col("doc_id"),
          (0 until 32).map(i => (when(col(s"b_$i") > 0, lit(1L)).otherwise(lit(0L)) *
            lit(1L << i)).as(s"bit_$i")).reduce(_ + _).as("simhash"))
      val x = sig.select(col("doc_id").as("id_a"), col("simhash"))
      val y = sig.select(col("doc_id").as("id_b"), col("simhash").as("simhash_b"))
      x.join(y, col("id_a") < col("id_b") && col("simhash") === col("simhash_b"))
        .select(col("id_a"), col("id_b"), col("simhash"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "text_langid" -> ((s, dir) => {
      // character-bigram profile scorer: for each language profile, score
      // = how many of its marker bigrams appear in the text; predict the
      // best-scoring language (deterministic tiebreak on language code).
      // On this corpus (shared vocabulary across langs) scores tie — the
      // classifier's discriminative power is spec-tested on crafted text.
      val profiles = Seq(
        "de" -> Seq("ch", "ei", "en", "er", "sch"),
        "en" -> Seq("th", "he", "in", "er", "an"),
        "es" -> Seq("de", "la", "os", "ci", "en"),
        "fr" -> Seq("le", "es", "on", "ou", "eu"),
        "zh" -> Seq("zh", "ng", "sh", "xi", "ia"))
      val scored = profiles.map { case (lang, marks) =>
        val score = marks.map(m => when(col("text").contains(m), 1).otherwise(0))
          .reduce((a, b) => a + b)
        // negative score + asc sort → best score first, ties broken by
        // language code ascending (deterministic)
        struct((lit(0) - score).cast("int").as("neg_score"), lit(lang).as("lang"))
      }
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang").as("true_lang"),
          sort_array(array(scored: _*)).getItem(0).getField("lang").as("pred_lang"))
        .orderBy(col("doc_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "expr_custom" ->
      """SELECT vec_id,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), 6) AS self_cos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

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
