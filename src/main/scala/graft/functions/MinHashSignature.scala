package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Full MinHash signature of a token-string array as one fused codegen
  * expression: `sig[i] = min over tokens of ((xxhash64(tok) mod P) * a_i
  * + b_i) mod P` with `a_i = 1299721 + 7919·i`, `b_i = 104729 + 337·i`,
  * `P = 1000000007`.
  *
  * The composable formulation — a `transform(tokens, xxhash64·pmod)`
  * projection followed by `numHashes` separate
  * `array_min(transform(...))` columns — evaluates interpreted lambdas
  * in `numHashes + 1` passes per document and allocates an intermediate
  * array per pass; interpreted eval chains are also the paths that
  * degrade when JIT call-site profiles go megamorphic in long-lived
  * sessions. This compiles to a single tight loop per document: hash
  * each token once, update all permutation minima in place, allocate
  * only the output. Hash math matches the composed form bit-for-bit
  * (Java wrapping long multiply, Spark `pmod` sign fix), so candidate
  * buckets are unchanged.
  *
  * Null if the input array is null or empty (matching `array_min`'s
  * null-on-empty). Output: array<long> of length `numHashes`.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${other.catalogString}")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val xs = v.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val s = xs.getUTF8String(t)
      val h = MinHashSignature.tokenHash(s)
      var i = 0
      while (i < numHashes) {
        val p = MinHashSignature.permute(h, i)
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[MinHashSignature].getName
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      s"""
         |int $n = $xs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $t = 0; $t < $n; $t++) {
         |    long $h = $cls.tokenHash($xs.getUTF8String($t));
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      long $p = $cls.permute($h, $i);
         |      if ($p < $mins[$i]) $mins[$i] = $p;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  final val Prime = 1000000007L

  /** `pmod(xxhash64(tok), P)` — same bytes, same seed (42) as the
    * built-in `xxhash64`.
    */
  def tokenHash(s: UTF8String): Long = {
    val raw = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    val m = raw % Prime
    if (m < 0) m + Prime else m
  }

  /** `pmod(h * (1299721 + 7919 i) + (104729 + 337 i), P)` with Java
    * wrapping multiply — identical to the non-ANSI Spark column math.
    */
  def permute(h: Long, i: Int): Long = {
    val v = (h * (1299721L + 7919L * i) + (104729L + 337L * i)) % Prime
    if (v < 0) v + Prime else v
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API: minhash signature over an array<string> column. */
  def signature(tokens: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), numHashes))
}
