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
      rightCols: Seq[String], inclusive: Boolean = true,
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward" || direction == "nearest",
      s"asofJoin direction must be backward|forward|nearest, got $direction")
    if (direction == "nearest")
      return asofJoinNearest(left, right, keyCol, tsCol, rightCols, inclusive, toleranceUs)
    val backward = direction == "backward"
    val leftCols = left.columns.toSeq
    val leftType = org.apache.spark.sql.types.StructType(leftCols.map(c => left.schema(c)))
    // the right payload carries its own event time (__rts) so a
    // tolerance bound can be applied AFTER the single window pass —
    // still one shuffle, no range-join explosion
    val rightPayload = struct(
      (col(tsCol).as("__rts") +: rightCols.map(col)): _*)
    val rightType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts", right.schema(tsCol).dataType) +:
        rightCols.map(c => right.schema(c)))
    // left rows sort BETWEEN right-at-same-ts depending on inclusivity
    // and direction. backward picks the last right in the PRECEDING
    // frame, forward the first right in the FOLLOWING frame:
    //   backward inclusive -> right (0) before left (1): same-ts in frame
    //   backward strict    -> right (2) after  left (1): same-ts outside
    //   forward  inclusive -> right (2) after  left (1): same-ts in frame
    //   forward  strict    -> right (0) before left (1): same-ts outside
    val rightSide = if (inclusive == backward) 0 else 2
    val l2 = left.select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r2 = right.select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
      lit(rightSide).as("__side"), lit(null).cast(leftType).as("__l"),
      rightPayload.as("__r"))
    val base = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
    val pick =
      if (backward)
        last(col("__r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__r"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val picked = l2.unionByName(r2)
      .withColumn("__asof", pick)
      .filter(col("__side") === 1)
    val bounded = toleranceUs match {
      case None => picked
      case Some(tol) =>
        val gap =
          if (backward) unix_micros(col("__ts")) - unix_micros(col("__asof.__rts"))
          else unix_micros(col("__asof.__rts")) - unix_micros(col("__ts"))
        picked.withColumn("__asof",
          when(col("__asof").isNotNull && gap <= tol, col("__asof")))
    }
    bounded.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Nearest as-of join: each left row picks the right row (same key)
    * whose timestamp is closest in EITHER direction; ties go backward
    * (the earlier right row), matching pandas `merge_asof
    * (direction='nearest')`.
    *
    * Same scale shape as the directional forms — ONE union + ONE keyed
    * window pass: both directional candidates come from two window
    * functions over the SAME partitioning and ordering, so Catalyst
    * plans a single Exchange+Sort and a single Window operator. No
    * range-join pair explosion, no second shuffle for the second
    * direction.
    *
    * Same-timestamp right rows are always a gap-0 match (inclusive
    * semantics — `inclusive=false` is not supported for nearest, as in
    * pandas where `allow_exact_matches` composes separately).
    */
  private def asofJoinNearest(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String], inclusive: Boolean,
      toleranceUs: Option[Long]): DataFrame = {
    require(inclusive, "asofJoin(direction=nearest) requires inclusive=true")
    val leftCols = left.columns.toSeq
    val leftType = org.apache.spark.sql.types.StructType(leftCols.map(c => left.schema(c)))
    val rightPayload = struct(
      (col(tsCol).as("__rts") +: rightCols.map(col)): _*)
    val rightType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__rts", right.schema(tsCol).dataType) +:
        rightCols.map(c => right.schema(c)))
    // rights sort BEFORE lefts at equal ts (side 0 < 1): the backward
    // frame (preceding..current) then includes same-ts rights, so the
    // forward frame (current..following) missing them is harmless — the
    // backward candidate already has gap 0 and wins the min-gap pick.
    val l2 = left.select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
      lit(1).as("__side"), struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(rightType).as("__r"))
    val r2 = right.select(col(keyCol).as("__key"), col(tsCol).as("__ts"),
      lit(0).as("__side"), lit(null).cast(leftType).as("__l"),
      rightPayload.as("__r"))
    val base = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), col("__r"))
    val back = last(col("__r"), ignoreNulls = true)
      .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__r"), ignoreNulls = true)
      .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val withBoth = l2.unionByName(r2)
      .withColumn("__back", back)
      .withColumn("__fwd", fwd)
      .filter(col("__side") === 1)
    // gap arithmetic works for timestamp AND plain numeric ts columns
    val us: Column => Column = left.schema(tsCol).dataType match {
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType => unix_micros(_)
      case _ => _.cast("long")
    }
    val gapB = us(col("__ts")) - us(col("__back.__rts"))
    val gapF = us(col("__fwd.__rts")) - us(col("__ts"))
    val picked = withBoth.withColumn("__asof",
      when(col("__fwd").isNull, col("__back"))
        .when(col("__back").isNull, col("__fwd"))
        .when(gapB <= gapF, col("__back"))
        .otherwise(col("__fwd")))
    val bounded = toleranceUs match {
      case None => picked
      case Some(tol) =>
        val gap = abs(us(col("__asof.__rts")) - us(col("__ts")))
        picked.withColumn("__asof",
          when(col("__asof").isNotNull && gap <= tol, col("__asof")))
    }
    bounded.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
