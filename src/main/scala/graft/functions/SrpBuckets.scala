package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `bands` signed-random-projection bucket keys of a double vector
  * as one fused codegen expression: band b's bucket packs `bandBits`
  * sign bits, bit i = sign(Σ_d r(g,d)·v_d) with global bit index
  * g = b·bandBits + i and the deterministic Rademacher pattern
  * r(g,d) = +1 iff pmod(xxhash64(d·131 + g), 2) == 0 (Spark's XXH64,
  * seed 42 — identical bit-for-bit to the composable
  * `sum(when(pmod(xxhash64(pos*131+g),2)=0, v).otherwise(-v))`
  * formulation this replaces, including left-to-right double
  * accumulation order, so bucket contents are unchanged).
  *
  * The composable formulation needs one sum-aggregate COLUMN per bit:
  * corpus-sized geometry (lshNearDupPairsAuto) reaches 250 bits at
  * 200k docs, and a 250-aggregate HashAggregate over the posexploded
  * components blows past codegen size limits into interpreted eval with
  * a per-(row,bit) xxhash64 — measured 267 s vs 3.4 s (78× for 10×
  * data) on emb_neardup_lsh. This expression is a pure projection (no
  * explode, no aggregate, no exchange): one tight loop per vector over
  * a cached ±1 matrix, any bit count, always inside whole-stage
  * codegen.
  *
  * Null if the input array is null or empty (the aggregate formulation
  * dropped empty vectors — posexplode emits no rows); callers filter
  * nulls. Output: array<long> of length `bands`.
  */
case class SrpBuckets(child: Expression, bandBits: Int, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_buckets expects array<double>, got ${other.catalogString}")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val xs = v.asInstanceOf[ArrayData]
    val dim = xs.numElements()
    if (dim == 0) return null
    new GenericArrayData(SrpBuckets.compute(xs, dim, bandBits, bands))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SrpBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, xs => {
      val dim = ctx.freshName("dim")
      s"""
         |int $dim = $xs.numElements();
         |if ($dim == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $cls.compute($xs, $dim, $bandBits, $bands));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {

  /** ±1 row for global bit g, grown to at least `dim` entries and cached
    * (bits × dim doubles — a few KB; shared across threads, idempotent
    * to race).
    */
  private val signCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  private def signRow(g: Int, dim: Int): Array[Double] = {
    val cached = signCache.get(g)
    if (cached != null && cached.length >= dim) return cached
    val grown = math.max(dim, 64)
    val row = Array.tabulate(grown) { d =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(131L * d + g, 42L)
      if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
    }
    signCache.put(g, row)
    row
  }

  /** Shared by eval and codegen: all band buckets of one vector. */
  def compute(xs: ArrayData, dim: Int, bandBits: Int, bands: Int): Array[Long] = {
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var i = 0
      while (i < bandBits) {
        val signs = signRow(b * bandBits + i, dim)
        var s = 0.0
        var d = 0
        while (d < dim) {
          s += signs(d) * xs.getDouble(d)
          d += 1
        }
        if (s > 0) bucket |= (1L << i)
        i += 1
      }
      buckets(b) = bucket
      b += 1
    }
    buckets
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: SRP band buckets over an array<double> column. */
  def buckets(vec: Column, bandBits: Int, bands: Int): Column =
    Bridge.column(SrpBuckets(Bridge.expression(vec), bandBits, bands))
}
