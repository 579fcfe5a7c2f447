package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run on sf0.001 and the contract maps must be
  * consistent — this is the cheap guard that Verify never hits a
  * runtime-broken query.
  */
class QuerySmokeSpec extends AnyFunSuite {
  import SparkFixture._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without a query: $extra")
  }

  test("declared inventory is complete (545 queries, all oracle-checked)") {
    assert(SparkEntry.queries.size >= 545)
    assert(SparkEntry.oracleSql.size >= 545)
    // every declared query is oracle-checked — a new query landing
    // without its oracle SQL fails here, not in the driver's compare
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }

  test("Conf.recommended builds a session with AQE and extensions") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = Conf.recommended(SparkSession.builder().master("local[2]"), 4).getOrCreate()
    try {
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(s.sql("SELECT dot_product(array(1.0D,2.0D), array(3.0D,4.0D))").head().getDouble(0) === 11.0)
    } finally {
      SparkSession.setDefaultSession(spark); SparkSession.setActiveSession(spark)
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
