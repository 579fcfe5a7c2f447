package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Library-facing text-analysis operators for training-data pipelines. */
object TextOps {

  private def toks(textCol: String) = split(col(textCol), " ")

  /** Corpus-wide token frequencies. */
  def tokenFrequencies(documents: DataFrame, textCol: String): DataFrame =
    documents.select(explode(toks(textCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))

  /** Bigram counts (within-document adjacency).
    *
    * Deliberately NOT a `transform(slice(...), (x,i) -> ...)` higher-order
    * function: HOFs evaluate interpreted (no codegen, no subexpression
    * elimination), so the inlined `split` re-runs per element — O(len²)
    * per document, and worse once JIT call-site profiles go megamorphic
    * in a long-lived session. posexplode + lead keeps every operator in
    * codegen; split runs exactly once per document.
    */
  def bigramCounts(documents: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    documents.select(col(idCol), posexplode(toks(textCol)).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
  }

  /** Per-document quality features: token count, average token length,
    * distinct-token ratio, and a simple pass/fail gate.
    */
  def qualityScores(documents: DataFrame, idCol: String, textCol: String,
      nCharsCol: String, minTokens: Int = 5, minChars: Int = 20): DataFrame =
    documents.withColumn("toks", toks(textCol))
      .select(
        col(idCol),
        size(col("toks")).as("n_tokens"),
        round(col(nCharsCol).cast("double") / size(col("toks")), 6).as("avg_tok_len"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6)
          .as("distinct_ratio"),
        (size(col("toks")) >= minTokens && col(nCharsCol) >= minChars).as("passes_quality"))

  /** Position-weighted integer rolling fingerprint — exact and
    * partial-aggregation-friendly (pure int64 arithmetic).
    */
  def fingerprints(documents: DataFrame, idCol: String, textCol: String): DataFrame =
    documents.select(col(idCol), posexplode(toks(textCol)).as(Seq("pos", "tok")))
      .groupBy(col(idCol))
      .agg(pmod(
        sum(pmod((col("pos") + 1) * lit(131L) + length(col("tok")) * lit(31L) +
          ascii(col("tok")), lit(1000000007L))),
        lit(1000000007L)).as("fingerprint"))

  /** Character-bigram-profile language scorer; deterministic tiebreak on
    * language code. Profiles: (lang → marker substrings).
    */
  def langId(documents: DataFrame, idCol: String, textCol: String,
      profiles: Seq[(String, Seq[String])] = defaultProfiles): DataFrame = {
    val scored = profiles.map { case (lang, marks) =>
      val score = marks.map(m => when(col(textCol).contains(m), 1).otherwise(0))
        .reduce((a, b) => a + b)
      struct((lit(0) - score).cast("int").as("neg_score"), lit(lang).as("lang"))
    }
    documents.select(col(idCol),
      sort_array(array(scored: _*)).getItem(0).getField("lang").as("pred_lang"))
  }

  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("ch", "ei", "en", "er", "sch"),
    "en" -> Seq("th", "he", "in", "er", "an"),
    "es" -> Seq("de", "la", "os", "ci", "en"),
    "fr" -> Seq("le", "es", "on", "ou", "eu"),
    "zh" -> Seq("zh", "ng", "sh", "xi", "ia"))
}
