package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Composable batch ETL pipeline — the linear extract→transform→load
  * shape of a weather-data pipeline, re-expressed lazily: stages compose
  * into ONE Catalyst plan, so filters written in late stages still push
  * down into the extract scan and nothing materializes between stages
  * (unlike the eager step-by-step scripts such pipelines usually are).
  *
  * {{{
  * val result = Pipeline(spark)
  *   .extractParquet(s"$dir/events.parquet")
  *   .transform(_.filter(col("value") > 0))
  *   .transform(Stages.parseJsonProps("props", "k"))
  *   .loadParquet(outDir)   // single action
  * }}}
  */
final case class Pipeline(spark: SparkSession, df: Option[DataFrame] = None) {

  private def current: DataFrame =
    df.getOrElse(throw new IllegalStateException("call extract* first"))

  def extractParquet(path: String): Pipeline =
    copy(df = Some(spark.read.parquet(path)))

  def extractCsv(path: String, schema: StructType, header: Boolean = true): Pipeline =
    copy(df = Some(spark.read.schema(schema).option("header", header.toString).csv(path)))

  def extractJson(path: String, schema: StructType): Pipeline =
    copy(df = Some(spark.read.schema(schema).json(path)))

  def transform(stage: DataFrame => DataFrame): Pipeline =
    copy(df = Some(stage(current)))

  def loadParquet(path: String, partitionBy: Seq[String] = Nil): DataFrame = {
    val w = current.write.mode("overwrite")
    (if (partitionBy.nonEmpty)
      w.partitionBy(partitionBy: _*) else w).parquet(path)
    spark.read.parquet(path)
  }

  def loadCsv(path: String): DataFrame = {
    current.write.mode("overwrite").option("header", "true").csv(path)
    current.sparkSession.read.option("header", "true")
      .schema(current.schema).csv(path)
  }

  def result: DataFrame = current
}

/** Reusable transform stages for the canonical weather-ETL operations. */
object Stages {

  /** Type coercion + renaming in one projection. */
  def coerce(cols: (String, String)*): DataFrame => DataFrame = df =>
    cols.foldLeft(df) { case (d, (name, typ)) => d.withColumn(name, col(name).cast(typ)) }

  /** QC-flag style filtering: keep rows whose flag column is in the
    * accepted set (or null = unflagged).
    */
  def qcFilter(flagCol: String, accepted: Seq[String]): DataFrame => DataFrame = df =>
    df.filter(col(flagCol).isNull || col(flagCol).isin(accepted: _*))

  /** Unit conversion: value * factor (e.g. tenths of °C → °C). */
  def convertUnit(valueCol: String, factor: Double): DataFrame => DataFrame = df =>
    df.withColumn(valueCol, col(valueCol) * factor)

  /** Pivot element rows (element, value) into element columns — the
    * GHCN-Daily TMAX/TMIN/PRCP reshape. Explicit element list keeps the
    * plan single-pass. The aggregate must be deterministic (min/max/sum
    * — NOT first(), which is partition-order-dependent); when (keys,
    * element) is unique, min == the single value.
    */
  def pivotElements(keyCols: Seq[String], elementCol: String, valueCol: String,
      elements: Seq[String],
      agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column = min(_))
      : DataFrame => DataFrame = df =>
    df.groupBy(keyCols.map(col): _*)
      .pivot(elementCol, elements)
      .agg(agg(col(valueCol)))

  /** JSON property extraction into a typed column — a single from_json
    * parse per row (get_json_object builds a parser per call).
    */
  def parseJsonProps(jsonCol: String, key: String): DataFrame => DataFrame = df =>
    df.withColumn(key, from_json(col(jsonCol),
      org.apache.spark.sql.types.StructType.fromDDL(s"$key STRING")).getField(key))

  /** Time-bucketed aggregation (daily → monthly style). */
  def timeRollup(tsCol: String, unit: String, keyCols: Seq[String],
      aggs: Seq[org.apache.spark.sql.Column]): DataFrame => DataFrame = df =>
    df.groupBy((date_trunc(unit, col(tsCol)).as("bucket") +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
}
