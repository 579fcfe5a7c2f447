package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin

/** Salted skew join correctness + bucketed-join shuffle elimination. */
class SkewBucketSpec extends AnyFunSuite {
  import SparkFixture._

  test("salted join result equals plain join on skewed data") {
    import spark.implicits._
    // hot key 1L carries 80% of rows
    val big = ((1 to 800).map(i => (1L, i)) ++ (1 to 200).map(i => (i.toLong % 50 + 2, i)))
      .toDF("k", "v")
    val small = (1L to 60L).map(k => (k, s"dim_$k")).toDF("sk", "name")
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "v", "name").collect().toSet
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "sk", saltBuckets = 8)
      .select("k", "v", "name").collect().toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("salting spreads the hot key across all buckets (bounded reducer share)") {
    import spark.implicits._
    val big = (1 to 800).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "dim_1")).toDF("sk", "name")
    // per-(key,salt) share after salting: the hot key must occupy all 8
    // buckets with no bucket above ~2x the even share — this is exactly
    // the reducer-size bound that saves the join at 100x skew
    val salted = big.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .groupBy(col("k"), col("__salt")).count().collect()
    assert(salted.length === 8, s"hot key must land in all 8 salt buckets: ${salted.length}")
    assert(salted.map(_.getAs[Long]("count")).max <= 200,
      "no salt bucket may carry more than 2x the even share")
    // and the declared query's salted result matches the plain join
    val viaApi = SkewJoin.saltedEquiJoin(big, small, "k", "sk", 8).count()
    assert(viaApi === 800)
  }

  test("salting bounds real post-shuffle partition sizes on a 90%-one-key frame") {
    import spark.implicits._
    // 90% of rows on one key — the adversarial skew shape. Measure the
    // ACTUAL partition sizes after hashing on (key, salt), exactly the
    // distribution the salted join's exchange produces, and compare with
    // the unsalted exchange on the same data.
    val n = 10000
    val big = (1 to n).map(i => (if (i <= 9000) 1L else (i % 97).toLong + 2L, i))
      .toDF("k", "v")
    val parts = 16
    def partSizes(df: org.apache.spark.sql.DataFrame): Array[Int] =
      df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    def saltedSizes(saltBuckets: Int): Array[Int] = partSizes(
      big.withColumn("__salt",
          pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
        .repartition(parts, col("k"), col("__salt")))
    val unsalted = partSizes(big.repartition(parts, col("k")))
    val mean = n.toDouble / parts
    // without salt the hot key pins >=90% of rows on one reducer
    assert(unsalted.max >= 9000, s"unsalted hot partition: ${unsalted.max}")
    // salt == partition count (the usual join setting): the hot key is
    // split 16 ways but several hot (key,salt) combos hash-collide into
    // one reducer — balls-into-bins max load, ~3-4x mean, still a ~4x cut
    // over the unsalted 14x
    val coarse = saltedSizes(parts)
    assert(coarse.max * 3 <= unsalted.max,
      s"16-way salting must cut the hot partition >=3x: ${coarse.max} vs ${unsalted.max}")
    // salt >> partitions (16x finer): per-reducer load is an average over
    // ~16 combos, collisions smooth out, and the measured bound reaches
    // the <=2x-mean target that keeps the join alive at 100x skew — salt
    // granularity, not salting per se, is what bounds the reducer
    val fine = saltedSizes(parts * 16)
    assert(fine.max <= (2.0 * mean).toInt,
      s"fine-salted max ${fine.max} vs mean $mean (sizes: ${fine.mkString(",")})")
  }

  test("salted theta-range self-join equals the plain range join (join_theta_range shape)") {
    // the declared join_theta_range puts each user's full event volume on
    // one reducer; this is its salted twin — identical result, hot user
    // spread over 4 salt buckets
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val a = ev.select(col("event_id").as("id_a"), col("user_id").as("u_a"), col("ts").as("ts_a"))
    val b = ev.select(col("event_id").as("id_b"), col("user_id").as("u_b"), col("ts").as("ts_b"))
    val range = col("ts_b") > col("ts_a") &&
      col("ts_b") <= col("ts_a") + expr("INTERVAL 10 MINUTES")
    val plain = a.join(b, col("u_a") === col("u_b") && range)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewJoin.saltedEquiJoin(a, b, "u_a", "u_b", 4, range)
      .select(col("id_a"), col("id_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
    assert(salted.nonEmpty)
  }

  test("bucketed join plan has no shuffle exchange (broadcast disabled)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // materialize the bucketed tables + query through the declared entry
      SparkEntry.queries("sink_bucketed_join")(spark, sf).collect()
      // the join itself (before agg) must be exchange-free on both sides
      val joined = spark.table("graft_lineitem_bkt")
        .join(spark.table("graft_orders_bkt"), col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join should not shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
