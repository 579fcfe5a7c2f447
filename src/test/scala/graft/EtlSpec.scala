package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Pipeline, Stages}

/** Pipeline facade semantics on crafted weather-shaped data. */
class EtlSpec extends AnyFunSuite {
  import SparkFixture._

  private lazy val weather = {
    import spark.implicits._
    Seq(
      // station, date, element, value(tenths), qc
      ("S1", "2020-01-01", "TMAX", 250.0, null.asInstanceOf[String]),
      ("S1", "2020-01-01", "TMIN", 100.0, null.asInstanceOf[String]),
      ("S1", "2020-01-01", "PRCP", 30.0, "X"), // rejected by QC
      ("S2", "2020-01-01", "TMAX", 300.0, "G")
    ).toDF("station", "date", "element", "value", "qc")
  }

  test("qcFilter keeps unflagged and accepted rows only") {
    val out = Stages.qcFilter("qc", Seq("G"))(weather)
    assert(out.count() === 3)
    assert(out.filter(col("qc") === "X").count() === 0)
  }

  test("convertUnit scales values") {
    val out = Stages.convertUnit("value", 0.1)(weather)
    assert(out.filter(col("element") === "TMAX" && col("station") === "S1")
      .head().getAs[Double]("value") === 25.0)
  }

  test("pivotElements reshapes element rows into columns") {
    val out = Stages.pivotElements(Seq("station", "date"), "element", "value",
      Seq("TMAX", "TMIN", "PRCP"))(weather)
    val s1 = out.filter(col("station") === "S1").head()
    assert(s1.getAs[Double]("TMAX") === 250.0)
    assert(s1.getAs[Double]("TMIN") === 100.0)
    assert(s1.getAs[Double]("PRCP") === 30.0)
    assert(out.columns.toSeq === Seq("station", "date", "TMAX", "TMIN", "PRCP"))
  }

  test("full pipeline composes into one plan and loads") {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_etl_spec"
    weather.write.mode("overwrite").parquet(s"$tmp/in")
    val result = Pipeline(spark)
      .extractParquet(s"$tmp/in")
      .transform(Stages.qcFilter("qc", Seq("G")))
      .transform(Stages.convertUnit("value", 0.1))
      .transform(Stages.pivotElements(Seq("station", "date"), "element", "value",
        Seq("TMAX", "TMIN")))
      .loadParquet(s"$tmp/out")
    val rows = result.orderBy("station").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("TMAX") === 25.0)
    assert(rows(1).getAs[Double]("TMAX") === 30.0)
  }

  test("lazy composition pushes late filters into the extract scan") {
    val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_etl_spec_push"
    weather.write.mode("overwrite").parquet(s"$tmp/in")
    val df = Pipeline(spark)
      .extractParquet(s"$tmp/in")
      .transform(_.withColumn("v2", col("value") * 2))
      .transform(_.filter(col("station") === "S1"))
      .result
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(station), EqualTo(station,S1)]"), plan)
  }
}
