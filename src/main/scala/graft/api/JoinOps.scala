package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Library-facing join operators that Spark SQL lacks as built-ins. */
object JoinOps {

  /** Backward as-of join: each left row picks the single most recent right
    * row with `right.ts <= left.ts` (or strictly `<` when
    * `inclusive = false`), matched on `keyCol`.
    *
    * Implemented as union + partitioned window, NOT as a range self-join:
    * both inputs shuffle ONCE on the key and the per-key scan is a single
    * ordered pass — O(n log n) per key, no candidate-pair explosion, no
    * skew amplification. This is the shape that survives 100 TB; a
    * `left.ts >= right.ts` theta join materializes O(|L|·|R|) candidate
    * pairs per key before picking the max.
    *
    * Output: every left column, plus each right column from `rightCols`
    * renamed `asof_<name>` (null when no right row precedes). Ties on
    * `right.ts` break deterministically on the right payload struct.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String], inclusive: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftType = org.apache.spark.sql.types.StructType(leftCols.map(c => left.schema(c)))
    val rightType = org.apache.spark.sql.types.StructType(rightCols.map(c => right.schema(c)))
    // left rows sort BETWEEN right-at-same-ts depending on inclusivity:
    // inclusive  -> right (0) before left (1): same-ts rights in frame
    // strict     -> right (2) after  left (1): same-ts rights fall outside
    val rightSide = if (inclusive) 0 else 2
    val l2 = left.select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r2 = right.select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
      lit(rightSide).as("__side"), lit(null).cast(leftType).as("__l"),
      struct(rightCols.map(col): _*).as("__r"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = l2.unionByName(r2)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    picked.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
