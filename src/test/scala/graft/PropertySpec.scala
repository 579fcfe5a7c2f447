package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over generated frames (SURVEY §5.3). Small
  * generators — each property round-trips through real Spark plans.
  * Uses raw scalacheck (scalatestplus bridge is not in the offline deps).
  */
class PropertySpec extends AnyFunSuite {
  import SparkFixture._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withMaxSize(30), p)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(Long, Double, String)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 20L)
      v <- Gen.choose(-1000.0, 1000.0)
      s <- Gen.oneOf("a", "b", "c")
    } yield (k, v, s))

  test("property: dropDuplicates is idempotent and bounded by distinct keys") {
    check(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "s")
      val d1 = df.dropDuplicates(Seq("k"))
      d1.count() == rows.map(_._1).distinct.size &&
        d1.dropDuplicates(Seq("k")).count() == d1.count()
    })
  }

  test("property: union-all count is additive, filter partitions counts") {
    check(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("k", "v", "s")
      val pos = df.filter(col("v") >= 0)
      val neg = df.filter(col("v") < 0)
      pos.count() + neg.count() == df.count() &&
        pos.unionAll(neg).count() == df.count()
    })
  }

  test("property: groupBy decimal sum equals exact driver-side sum") {
    check(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val cents = rows.map { case (k, v, s) => (k, math.round(v * 100) / 100.0, s) }
      val df = cents.toDF("k", "v", "s")
      val sparkSum = BigDecimal(df.agg(sum(Tables.dec2(col("v")))).head().getDecimal(0))
      val local = cents.map(r => BigDecimal(r._2.toString)).sum
      sparkSum.setScale(2) == local.setScale(2)
    })
  }

  test("property: window row_number is a permutation of 1..n per partition") {
    check(Prop.forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex.map { case ((k, v, s), i) => (k, v, s, i.toLong) }
        .toDF("k", "v", "s", "id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("s").orderBy(col("v"), col("id"))
      df.withColumn("rn", row_number().over(w))
        .groupBy("s").agg(sort_array(collect_list(col("rn"))).as("rns"), count(lit(1)).as("n"))
        .collect()
        .forall(r => r.getAs[Seq[Int]]("rns") == (1 to r.getAs[Long]("n").toInt))
    })
  }

  test("property: asofJoin equals the naive range-join + argmax formulation") {
    // left rows (key, ts); right rows (key, ts, px) with colliding keys
    // and ts so inclusive/strict boundaries and no-match cases all occur
    val leftGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 12L)
    } yield (k, t))
    val rightGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 12L)
      p <- Gen.choose(1.0, 9.0)
    } yield (k, t, p))
    check(Prop.forAll(leftGen, rightGen, Gen.oneOf(true, false)) { (ls, rs, incl) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "key", "ts")
      val right = rs.toDF("key", "ts", "px")
      val got = graft.api.JoinOps
        .asofJoin(left, right, "key", "ts", rightCols = Seq("ts", "px"), inclusive = incl)
        .collect()
        .map(r => r.getAs[Long]("lid") ->
          (Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
           Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble))).toMap
      // naive reference: max-(ts,px) right row at or before each left ts
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter(r => r._1 == k && (if (incl) r._2 <= t else r._2 < t))
        i.toLong -> (if (cands.isEmpty) (None, None) else {
          val best = cands.maxBy(r => (r._2, r._3))
          (Some(best._2), Some(best._3))
        })
      }.toMap
      got == expected
    })
  }

  test("property: asofJoin nearest equals the naive min-abs-gap reference") {
    val leftGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 12L)
    } yield (k, t))
    val rightGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 12L)
      p <- Gen.choose(1.0, 9.0)
    } yield (k, t, p))
    check(Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      import spark.implicits._
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "key", "ts")
      val right = rs.toDF("key", "ts", "px")
      val got = graft.api.JoinOps
        .asofJoin(left, right, "key", "ts", rightCols = Seq("ts", "px"),
          direction = "nearest")
        .collect()
        .map(r => r.getAs[Long]("lid") ->
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong)).toMap
      // naive: min |gap|; tie → backward (smaller ts); among equal-ts
      // rights the engine picks deterministically, so compare on ts only
      val expected = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rs.filter(_._1 == k)
        i.toLong -> (if (cands.isEmpty) None else {
          val best = cands.minBy(r => (math.abs(r._2 - t), r._2))
          Some(best._2)
        })
      }.toMap
      got == expected
    })
  }

  test("property: TopKDoubles equals sort-descending-take-k (partials forced)") {
    val rowsGen = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 2); v <- Gen.choose(-1000.0, 1000.0)
    } yield (g, v))
    check(Prop.forAll(rowsGen, Gen.choose(1, 5)) { (rows, k) =>
      import spark.implicits._
      // repartition(3) forces multiple partitions → map-side partials,
      // shuffled partial buffers, and final merge all execute
      val df = rows.toDF("g", "v").repartition(3)
      val got = df.groupBy(col("g"))
        .agg(graft.functions.TopKDoubles.topK(col("v"), k).as("top"))
        .collect().map(r => r.getInt(0) -> r.getAs[Seq[Double]]("top")).toMap
      val expected = rows.groupBy(_._1).map { case (g, vs) =>
        g -> vs.map(_._2).sorted(Ordering[Double].reverse).take(k)
      }
      got == expected
    })
  }

  test("property: DotProduct matches the composable zip_with formulation") {
    val vecGen = Gen.listOfN(8, Gen.choose(-10.0, 10.0))
    check(Prop.forAll(vecGen, vecGen) { (xs, ys) =>
      import spark.implicits._
      val df = Seq((xs, ys)).toDF("a", "b")
      val custom = df.select(graft.functions.DotProduct.dot(col("a"), col("b"))).head().getDouble(0)
      val composed = df.select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      ).head().getDouble(0)
      custom == composed
    })
  }
}
