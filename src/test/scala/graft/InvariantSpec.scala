package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants that need no oracle (SURVEY §5.3). */
class InvariantSpec extends AnyFunSuite {
  import SparkFixture._

  test("dedup is idempotent") {
    val once = SparkEntry.queries("dedup_exact")(spark, sf)
    assert(once.count() === once.distinct().count())
  }

  test("topk is a subset of the full sort's head") {
    val top = SparkEntry.queries("topk")(spark, sf).collect().map(_.getLong(0))
    val full = Tables.orders(spark, sf)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100).collect().map(_.getLong(0))
    assert(top.sameElements(full))
  }

  test("union_all counts are additive") {
    val n = SparkEntry.queries("set_union_all")(spark, sf).count()
    assert(n === Tables.orders(spark, sf).count())
  }

  test("window rank stays within partition size") {
    val bad = SparkEntry.queries("win_rank")(spark, sf)
      .filter(col("rn") < 1 || col("rn") > 7)
    assert(bad.count() === 0)
  }

  test("cosine self-similarity of unit embeddings is 1") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
      .withColumn("self_dot",
        aggregate(zip_with(col("e"), col("e"), (x, y) => x * y), lit(0.0), (a, v) => a + v))
    val offUnit = emb.filter(abs(col("self_dot") - 1.0) > 1e-5)
    assert(offUnit.count() === 0)
  }

  test("approx_percentile is within 2% of exact percentile per group") {
    val rows = SparkEntry.queries("agg_approx_percentile")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Boolean]("median_in_band"),
        s"status=${r.get(0)} approx median outside 2% of exact " +
          s"${r.getAs[Double]("exact_median")}")
      assert(r.getAs[Boolean]("p90_in_band"),
        s"status=${r.get(0)} approx p90 outside 2% of exact " +
          s"${r.getAs[Double]("exact_p90")}")
    }
  }

  test("approx_count_distinct is within 5% of exact") {
    val row = SparkEntry.queries("agg_approx_distinct")(spark, sf).head()
    assert(row.getAs[Boolean]("approx_in_band"),
      s"approx distinct outside 5% of exact ${row.getAs[Long]("exact_parts")}")
  }

  test("filtered scan is a subset of the full scan") {
    val filtered = SparkEntry.queries("scan_pushdown")(spark, sf).count()
    val full = Tables.lineitem(spark, sf).count()
    assert(filtered <= full)
  }

  test("minhash candidates contain all exact-duplicate pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark query join sort batch"),
      (2L, "spark query join sort batch"),   // exact dup of 1
      (3L, "stream window state shuffle partition"),
      (4L, "stream window state shuffle partition"), // exact dup of 3
      (5L, "completely different tokens here now")
    ).toDF("doc_id", "text")
    // the same candidate generator the declared dedup_minhash report
    // grades in-band, driven directly on the crafted frame
    val pairs = graft.api.DedupOps.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing (1,2) in $pairs")
    assert(pairs.contains((3L, 4L)), s"missing (3,4) in $pairs")
    assert(!pairs.contains((1L, 5L)))
  }

  test("fingerprints of identical texts are equal, different texts differ") {
    val fp = SparkEntry.queries("text_fingerprint")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Tables.documents(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byText = texts.groupBy(_._2).values
    for (group <- byText; ids = group.keys.toSeq; if ids.size > 1) {
      assert(ids.map(fp).distinct.size === 1, s"same text, different fingerprints: $ids")
    }
  }
}
