package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Centralized table loading for all graft queries.
  *
  * Every query function receives `(spark, sfDir)` and must load inputs
  * through here so that per-table quirks are fixed in exactly one place.
  *
  * Scale notes (100 TB design): loaders return plain scans — no caching,
  * no repartition — so Catalyst keeps full freedom to push predicates and
  * prune columns into the parquet reader. Callers `.select(...)` early.
  */
object Tables {

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark
    * 4.1.2 rejects (PARQUET_TYPE_ILLEGAL). Read it as raw long nanos and
    * rebuild a microsecond timestamp; DuckDB truncates ns→µs on scan, so
    * values agree exactly with the oracle afterwards.
    * The conf is runtime-settable, so this works under the driver's
    * pre-built session too.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer DIV, not `/`: ns values exceed double's 53-bit mantissa, so
    // float division is off by ±1µs on some rows vs DuckDB's truncation.
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Exact-decimal money arithmetic. All money/quantity columns in the
    * testdata carry ≤2 decimals (verified), so this cast is lossless and
    * sums/products computed in DecimalType are bit-identical between Spark
    * and DuckDB — immune to double summation-order and round-half ties.
    * Cast aggregate results back to double for a stable output type.
    */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")
}
