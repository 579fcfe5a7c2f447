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

  /** The on-disk encoding of `events.ts` has changed across testdata
    * regenerations (INT64 TIMESTAMP(NANOS) → plain timestamp[us] on
    * 2026-08-13), so the loader is schema-adaptive: it inspects the
    * footer-derived type and normalizes to a session-TZ (UTC)
    * TimestampType with microsecond values either way. nanosAsLong is a
    * runtime-settable conf, so this works under the driver's pre-built
    * session too; it is a no-op for non-NANOS files.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(s.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize an events-shaped frame so `ts` is TimestampType (µs,
    * session TZ = UTC) regardless of how the parquet encoded it:
    *  - LongType      → raw ns read under nanosAsLong; integer DIV 1000
    *    (not `/`: ns exceed double's 53-bit mantissa, float division is
    *    off by ±1µs on some rows vs DuckDB's truncation) → µs timestamp.
    *  - TimestampNTZType → µs wall-clock; with the session TZ pinned to
    *    UTC the cast to TimestampType preserves the stored micros.
    *  - TimestampType → already what we want.
    * Shared by the batch loader and the streaming source so a future
    * re-encoding is fixed in exactly one place.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet-derived type $other — " +
          "extend Tables.normalizeEventsTs for the new encoding")
    }
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
