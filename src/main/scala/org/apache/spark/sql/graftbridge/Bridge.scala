package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's private[sql] Column↔Expression conversion
  * (Spark 4 wraps Columns in ColumnNodes; the public API offers no way to
  * lift a custom Catalyst Expression into a Column). Lives under
  * org.apache.spark.sql.* purely for package-private access — the same
  * technique third-party Spark extensions (e.g. connectors, Sedona-style
  * libraries) use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an already-analyzed LogicalPlan as a DataFrame (private[sql]
    * `Dataset.ofRows`) — how a DML rewrite hands the resolved source
    * plan of a MERGE to the lake mutation API.
    */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
