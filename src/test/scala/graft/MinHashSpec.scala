package graft

import graft.functions.MinHashSignature
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused codegen MinHash signature must match the composable
  * column formulation (transform + array_min per permutation)
  * bit-for-bit — candidate buckets depend on exact hash values.
  */
class MinHashSpec extends AnyFunSuite {
  import SparkFixture._

  private val P = 1000000007L
  private val numHashes = 16

  private def composedSigs = (0 until numHashes).map { i =>
    val a = 1299721L + 7919L * i
    val b = 104729L + 337L * i
    array_min(transform(col("th"), h => pmod(h * lit(a) + lit(b), lit(P)))).as(s"mh_$i")
  }

  test("fused signature equals transform/array_min composition on documents") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
    val fused = docs.select(col("doc_id"),
      MinHashSignature.signature(col("ts"), numHashes).as("sig"))
    val composed = docs
      .withColumn("th", transform(col("ts"), t => pmod(xxhash64(t), lit(P))))
      .select((col("doc_id") +: composedSigs): _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
  }

  test("empty and null token arrays yield null signatures") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("id", "ts")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "ts"))
    val out = df.select(col("id"),
      MinHashSignature.signature(col("ts"), 4).as("sig")).collect()
    val byId = out.map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!byId(1L) && byId(2L) && byId(3L))
  }

  test("signature survives interpreted (non-codegen) evaluation too") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val docs = Tables.documents(spark, sf)
        .select(array_distinct(split(col("text"), " ")).as("ts"))
      val n = docs.select(MinHashSignature.signature(col("ts"), 8).as("sig"))
        .filter(size(col("sig")) === 8).count()
      assert(n === docs.count())
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
