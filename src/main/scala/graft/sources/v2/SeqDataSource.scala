package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 connector — the Spark-native way to expose an
  * external system as a table. Deterministic synthetic rows
  * `(id BIGINT, val BIGINT, cat STRING)` with `val = (id·31 + 7) mod 997`
  * and `cat = 'c' || (id mod 5)`, generated server-side so pushdown is
  * OBSERVABLE: a pushed id-range shrinks what the "server" produces,
  * exactly like predicate pushdown against a real store.
  *
  * Implements the full read-path contract a production connector needs:
  *  - [[TableProvider]] / [[SupportsRead]] with BATCH_READ capability
  *  - [[SupportsPushDownFilters]]: id-range predicates (>, >=, <, <=)
  *    are absorbed into the generator bounds and REMOVED from the
  *    post-scan filter (accepted filters return empty residuals);
  *    anything else is left for Spark to evaluate
  *  - [[SupportsPushDownRequiredColumns]]: the reader materializes only
  *    the projected columns (column pruning reaches the source)
  *  - parallel [[InputPartition]]s: the id range splits into `parts`
  *    contiguous slices — partition-parallel like a real scan
  *
  * Usage: `spark.read.format("graft.sources.v2.SeqDataSource")
  *   .option("rows", "200000").option("parts", "8").load()`
  */
class SeqDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object SeqDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("cat", StringType, nullable = false)))
}

class SeqTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, parts)
}

class SeqScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SeqDataSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case IsNotNull("id")                   => true // columns are non-null
      case _                                 => false
    }
    accepted = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SeqScan(lo, hi, parts, required)
}

class SeqScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaced in .explain() so PlanSpec can assert the pushed range
  override def description(): String =
    s"graft_seq lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, parts)
    val span = math.max(0L, hi - lo)
    (0 until n).map { i =>
      val s = lo + span * i / n
      val e = lo + span * (i + 1) / n
      SeqInputPartition(s, e): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

case class SeqInputPartition(start: Long, end: Long) extends InputPartition

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqInputPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val values = fields.map {
          case "id"  => cur: java.lang.Long
          case "val" => (cur * 31L + 7L) % 997L: java.lang.Long
          case "cat" => UTF8String.fromString("c" + (cur % 5L))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
