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

  test("extensions session rewrites rank filters into TopKPerKey and matches the Window result") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(desc("value"), col("event_id"))
    def build(s: SparkSession) = Tables.events(s, SparkFixture.sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    val rewritten = build(extSpark)
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("GraftTopKPerKey"),
      rewritten.queryExecution.optimizedPlan.toString)
    val viaTopK = rewritten.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaWindow = build(SparkFixture.spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaTopK == viaWindow,
      s"bounded-heap result diverges from Window: ${viaTopK.diff(viaWindow).take(3)} / ${viaWindow.diff(viaTopK).take(3)}")
  }

  test("rank-filter rewrite leaves rank() (non-row_number) windows untouched") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(desc("value"), col("event_id"))
    val df = Tables.events(extSpark, SparkFixture.sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
    assert(!df.queryExecution.optimizedPlan.toString.contains("GraftTopKPerKey"),
      df.queryExecution.optimizedPlan.toString)
  }
}
