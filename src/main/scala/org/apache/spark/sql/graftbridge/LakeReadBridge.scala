package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.{FileIndex, NoopCache,
  PartitionDirectory, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge for the graft.lake DSv2 read path (same private[sql] access
  * rationale as [[Bridge]]): adapts the lake's manifest-backed
  * [[FileIndex]] to the [[PartitioningAwareFileIndex]] shape Spark's
  * built-in v2 parquet scan machinery requires, and hands back the REAL
  * [[ParquetScanBuilder]] — so a `TableCatalog`-resolved lake table gets
  * the identical vectorized parquet reader, filter/column pushdown, and
  * whole-stage codegen as Spark's own file sources, with the lake's
  * manifest-stats file pruning running inside `listFiles` exactly as it
  * does on the v1 path. No custom PartitionReaderFactory: a hand-rolled
  * row-based DSv2 reader would silently lose columnar batches.
  */
object LakeReadBridge {

  /** A PartitioningAwareFileIndex (unpartitioned) that delegates every
    * FileIndex decision — crucially the stats-pruned `listFiles` — to
    * the lake's manifest index.
    */
  private class DelegatingIndex(spark: SparkSession, underlying: FileIndex,
      schema: StructType)
      extends PartitioningAwareFileIndex(spark, Map.empty, Some(schema), NoopCache) {

    override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

    private lazy val allStatuses: Seq[FileStatus] =
      underlying.listFiles(Nil, Nil).flatMap(_.files.map(_.fileStatus))

    override def leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
      allStatuses.foreach(s => m += (s.getPath -> s))
      m
    }

    override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
      allStatuses.groupBy(_.getPath.getParent).map { case (d, fs) => d -> fs.toArray }

    // the whole point: manifest-stats pruning decides the splits
    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      underlying.listFiles(partitionFilters, dataFilters)

    override def sizeInBytes: Long = underlying.sizeInBytes
    override def inputFiles: Array[String] = underlying.inputFiles
    override def rootPaths: Seq[Path] = underlying.rootPaths
    override def refresh(): Unit = underlying.refresh()
  }

  /** The v2 ScanBuilder for a clean (no deletion vectors, no column
    * renames) lake snapshot: Spark's own ParquetScanBuilder over the
    * delegating index.
    */
  def parquetScanBuilder(spark: SparkSession, underlying: FileIndex,
      schema: StructType, options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetScanBuilder(spark, new DelegatingIndex(spark, underlying, schema),
      schema, schema, options)
}
