package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{DedupOps, SimilarityOps, TextOps}

/** The api.* functions with NON-default parameters on crafted frames —
  * proves the extracted API is genuinely parameterized, not just the
  * contract queries re-rolled.
  */
class ApiSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d"),
      (2L, "a b c e"),     // jaccard 3/5 with doc 1
      (3L, "a b c d"),     // exact dup of 1
      (4L, "x y z w v")
    ).toDF("doc_id", "text")
  }

  test("nearJaccardPairs honors a lowered 1/2 threshold") {
    val pairs = DedupOps.nearJaccardPairs(docs, "doc_id", "text", num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"jaccard 0.6 pair must pass 0.5: $pairs")
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // and the default 4/5 threshold excludes the 0.6 pair
    val strict = DedupOps.nearJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!strict.contains((1L, 2L)))
    assert(strict.contains((1L, 3L)))
  }

  test("nearDupPipeline output is a subset of exact pairs with full dup recall") {
    val exact = DedupOps.nearJaccardPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val piped = DedupOps.nearDupPipeline(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(piped.subsetOf(exact), s"pipeline=$piped exact=$exact")
    assert(piped.contains((1L, 3L)), "exact duplicates must survive the pipeline")
  }

  test("minhashCandidates with 8 hashes / 2 bands still finds exact dups") {
    val cand = DedupOps.minhashCandidates(docs, "doc_id", "text",
      numHashes = 8, bands = 2, bucketCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 3L)), s"$cand")
  }

  test("cosineTopK with k=1 returns the single best pair") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("id", "vec")
    val top = SimilarityOps.cosineTopK(emb, "id", "vec", k = 1).collect()
    assert(top.length === 1)
    assert((top(0).getLong(0), top(0).getLong(1)) === (1L, 2L))
  }

  test("qualityScores gate respects custom thresholds") {
    val strict = TextOps.qualityScores(
      docs.withColumn("n_chars", length(col("text"))),
      "doc_id", "text", "n_chars", minTokens = 5, minChars = 1)
    assert(strict.filter(col("passes_quality")).count() === 1) // only the 5-token doc
  }

  test("asofJoin picks the latest preceding right row, inclusive and strict") {
    import spark.implicits._
    val trades = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 15L))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", 10L, 1.0), ("A", 15L, 2.0), ("B", 99L, 9.0))
      .toDF("sym", "ts", "px")
    def run(incl: Boolean) = graft.api.JoinOps
      .asofJoin(trades, quotes, "sym", "ts", rightCols = Seq("ts", "px"), inclusive = incl)
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    val incl = run(true)
    assert(incl(1L) === Some(1.0))  // quote at ts=10 matches ts=10 inclusively
    assert(incl(2L) === Some(2.0))  // latest of the two preceding quotes
    assert(incl(3L) === None)       // B's only quote is in the future
    val strict = run(false)
    assert(strict(1L) === None)     // same-ts quote excluded when strict
    assert(strict(2L) === Some(2.0))
  }

  test("asofJoin nearest picks the closest right row either side, ties backward") {
    import spark.implicits._
    val trades = Seq((1L, "A", 10L), (2L, "A", 17L), (3L, "B", 5L), (4L, "C", 1L))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", 8L, 1.0), ("A", 12L, 2.0), ("A", 18L, 3.0), ("B", 99L, 9.0))
      .toDF("sym", "ts", "px")
    val got = graft.api.JoinOps
      .asofJoin(trades, quotes, "sym", "ts", rightCols = Seq("ts", "px"),
        direction = "nearest")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(got(1L) === Some(1.0)) // ts=10: gap 2 both sides → tie goes BACKWARD (8)
    assert(got(2L) === Some(3.0)) // ts=17: 18 (gap 1) beats 12 (gap 5)
    assert(got(3L) === Some(9.0)) // only a future quote — nearest still matches
    assert(got(4L) === None)      // no C quotes at all
    val bounded = graft.api.JoinOps
      .asofJoin(trades, quotes, "sym", "ts", rightCols = Seq("px"),
        direction = "nearest", toleranceUs = Some(3L))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(bounded(3L) === None)  // B's gap 94 exceeds the tolerance
    assert(bounded(2L) === Some(3.0))
  }

  test("langId accepts custom profiles") {
    val out = TextOps.langId(docs, "doc_id", "text",
      profiles = Seq("xx" -> Seq("x y" -> 1.0), "aa" -> Seq("a b" -> 1.0)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(4L) === "xx")
    assert(out(1L) === "aa")
  }
}
