package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions registration: SQL function + optimizer rule.
  * Runs in its own session (same SparkContext) so the fixture session is
  * untouched; forked test JVM runs suites sequentially.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val extSpark: SparkSession = {
    SparkFixture.spark // ensure context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    SparkSession.setDefaultSession(SparkFixture.spark)
    SparkSession.setActiveSession(SparkFixture.spark)
    s
  }

  test("dot_product is callable from SQL via injected function") {
    val v = extSpark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(v === 11.0)
  }

  // parquet-backed input — a literal frame would be constant-folded into
  // a LocalRelation before the plan shape can be observed
  private def emb = Tables.embeddings(extSpark, SparkFixture.sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))

  test("optimizer rule rewrites aggregate(zip_with(*)) into DotProduct") {
    val df = emb.select(col("vec_id"),
      aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("self_dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproduct"), optimized)
    val row = df.orderBy("vec_id").head()
    assert(math.abs(row.getAs[Double]("self_dot") - 1.0) < 1e-5)
  }

  test("rule leaves non-matching aggregates untouched") {
    val df = emb.select(col("vec_id"),
      aggregate(zip_with(col("e"), col("e"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v).as("not_dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("dotproduct"), optimized)
  }
}
