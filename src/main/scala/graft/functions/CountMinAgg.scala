package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Count-Min sketch over 64-bit keys as a Catalyst
  * `TypedImperativeAggregate` — the mergeable frequency-sketch
  * counterpart to the HLL cardinality sketch (`sketch_hll_merge`) and
  * the bounded top-k heap (`TopKDoubles`).
  *
  * Buffer: `depth × width` longs. `update` increments one counter per
  * row (hashed with a splitmix64 finalizer seeded per row-index);
  * `merge` is elementwise addition, so partial aggregation composes at
  * any tree depth — at 100 TB each map task ships exactly
  * `depth·width·8` bytes (8 KiB at 4×256) per group regardless of input
  * rows, and sketches built over disjoint shards/days OR-merge without
  * rescanning raw data (the same accounting HLL gives distinct counts).
  *
  * Estimate (`CountMinSketchOps.estimate`): min over rows of the
  * addressed counters — a deterministic pure function of (sketch, key).
  * Guarantees: est ≥ true count always (counters only over-count);
  * est ≤ true + ε·N with probability 1−δ, ε = e/width, δ = e^−depth.
  */
case class CountMinLongs(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth > 0 && width > 0, s"count_min requires depth/width > 0, got $depth x $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"count_min expects a bigint key column, got ${t.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinLongs.slot(key, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinLongs =
    copy(child = newChild)
  override def prettyName: String = "count_min"
}

object CountMinLongs {
  /** Row-seeded splitmix64 finalizer → counter slot. Pure arithmetic on
    * longs (identical on every JVM/executor — no object hashing). */
  def slot(key: Long, row: Int, width: Int): Int = {
    var h = key + (row + 1) * 0x9E3779B97F4A7C15L
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^= (h >>> 33)
    (((h % width) + width) % width).toInt
  }

  /** Column API: the sketch (depth·width longs, row-major) of a bigint
    * key column. */
  def countMin(c: Column, depth: Int, width: Int): Column =
    Bridge.column(CountMinLongs(Bridge.expression(c), depth, width).toAggregateExpression())
}

/** Driver-free sketch arithmetic shared by queries and specs. */
object CountMinSketchOps {
  /** Point estimate: min of the addressed counters. */
  def estimate(sketch: Seq[Long], key: Long, depth: Int, width: Int): Long = {
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch(i * width + CountMinLongs.slot(key, i, width))
      if (c < min) min = c
      i += 1
    }
    min
  }
}
