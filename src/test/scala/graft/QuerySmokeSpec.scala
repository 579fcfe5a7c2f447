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

  test("declared inventory is complete (>= 60 queries, >= 55 oracle)") {
    assert(SparkEntry.queries.size >= 60)
    assert(SparkEntry.oracleSql.size >= 55)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
