package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection cardinality of two SORTED arrays (int, long or string
  * elements) as one codegen two-pointer merge — the exact-Jaccard hot
  * path for per-pair set comparison at any vocabulary size.
  *
  * `size(array_intersect(a, b))` builds a hash set and an output array
  * per pair in interpreted eval; on the ~6M-pair blocked self-joins of
  * near-dup detection that is the dominant cost (measured 55µs/pair on
  * 51-element string sets — the same interpreted bottleneck class as
  * the lambda higher-order functions, see MinHashSignature). This
  * compiles to an allocation-free merge scan. Prefer the numeric forms:
  * hash set elements upstream (xxhash64 token ids) so the merge is
  * primitive getLong + compare, ~100x cheaper per element than
  * UTF8String access + byte comparison.
  *
  * PRECONDITION: both inputs sorted ascending (numeric order for ints,
  * UTF8String binary order for strings — what `sort_array` produces)
  * and duplicate-free — what the dedup set builders emit. Unsorted
  * input silently undercounts; this is a building block for DedupOps,
  * not a general SQL function.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) |
           (ArrayType(LongType, _), ArrayType(LongType, _)) |
           (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_size expects two array<int>, two array<bigint> " +
            s"or two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val m = ys.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    elemType match {
      case IntegerType =>
        while (i < n && j < m) {
          val x = xs.getInt(i)
          val y = ys.getInt(j)
          if (x == y) { cnt += 1; i += 1; j += 1 }
          else if (x < y) i += 1
          else j += 1
        }
      case LongType =>
        while (i < n && j < m) {
          val x = xs.getLong(i)
          val y = ys.getLong(j)
          if (x == y) { cnt += 1; i += 1; j += 1 }
          else if (x < y) i += 1
          else j += 1
        }
      case _ =>
        while (i < n && j < m) {
          val c = xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
          if (c == 0) { cnt += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val body = if (elemType == IntegerType || elemType == LongType) {
        val (jt, getter) =
          if (elemType == IntegerType) ("int", "getInt") else ("long", "getLong")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |while ($i < $n && $j < $m) {
           |  $jt $x = $a.$getter($i);
           |  $jt $y = $b.$getter($j);
           |  if ($x == $y) { $cnt++; $i++; $j++; }
           |  else if ($x < $y) { $i++; }
           |  else { $j++; }
           |}
         """.stripMargin
      } else {
        val c = ctx.freshName("c")
        s"""
           |while ($i < $n && $j < $m) {
           |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
           |  if ($c == 0) { $cnt++; $i++; $j++; }
           |  else if ($c < 0) { $i++; }
           |  else { $j++; }
           |}
         """.stripMargin
      }
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |$body
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: |a ∩ b| for sorted, distinct array<string> columns. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
}
