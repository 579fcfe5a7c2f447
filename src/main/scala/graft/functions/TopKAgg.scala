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

/** Per-group top-k doubles as a Catalyst `TypedImperativeAggregate` —
  * the third custom-operator surface next to scalar codegen Expressions
  * (DotProduct/SrpBuckets) and typed `Aggregator`s (GeoMean): an
  * imperative aggregate with an arbitrary Java object buffer and
  * explicit byte-level partial serialization.
  *
  * The buffer is a bounded min-heap of size ≤ k, so a group of n rows
  * aggregates in O(n log k) memory-O(k) — the partials that ship
  * through the map-side combine and the shuffle are k doubles, NOT the
  * group's rows. That is why this scales where
  * `slice(sort_array(collect_list(x), false), 1, k)` does not: at 100 TB
  * collect_list materializes every group's full value set in the
  * aggregation buffer (deferred to sort AFTER the shuffle moves it all),
  * while this moves exactly k·8 bytes per group per map task.
  *
  * `merge` re-offers the other heap's elements under the same bound, so
  * the operation is associative and commutative — safe for partial
  * aggregation at any tree depth. Output: the group's k largest values,
  * descending (fewer if the group is smaller). Duplicate values are kept
  * (multiset semantics), which makes the result deterministic even when
  * ties straddle the k boundary.
  */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k > 0, s"top_k requires k > 0, got $k")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k expects a double column, got ${t.catalogString}")
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def offer(heap: java.util.PriorityQueue[java.lang.Double], v: Double): Unit = {
    if (heap.size < k) heap.offer(v)
    else if (v > heap.peek()) { heap.poll(); heap.offer(v) }
  }

  override def update(heap: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Double])
    heap
  }

  override def merge(heap: java.util.PriorityQueue[java.lang.Double],
      other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) offer(heap, it.next())
    heap
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Double]): Any = {
    // non-destructive: eval must not drain the buffer — the engine may
    // serialize or re-evaluate it after this call (sort-based fallback)
    val arr = new Array[Double](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    val desc = new Array[Double](arr.length)
    i = 0
    while (i < arr.length) { desc(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(desc)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(heap, bb.getDouble); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKDoubles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKDoubles =
    copy(child = newChild)
  override def prettyName: String = "top_k"
}

object TopKDoubles {
  /** Column API: per-group array of the k largest values, descending. */
  def topK(c: Column, k: Int): Column =
    Bridge.column(TopKDoubles(Bridge.expression(c), k).toAggregateExpression())
}
