package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Session extensions for the graft engine — the Spark-native way to ship
  * custom operators to SQL users (`spark.sql.extensions=graft.plans.GraftExtensions`
  * or `builder.withExtensions`):
  *
  * - SQL function `dot_product(array<double>, array<double>)` backed by
  *   the codegen'd [[DotProduct]] expression.
  * - Optimizer rule [[RewriteZipWithDot]] that recognizes the composable
  *   formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0D,
  *   (acc,v) -> acc+v)` and replaces it with [[DotProduct]] — users who
  *   write idiomatic higher-order-function code get the fused loop for
  *   free (~6× on the 2M-pair similarity joins).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    e.injectOptimizerRule(_ => RewriteZipWithDot)
    // per-key top-k: rank-filter rewrite + bounded-heap physical operator
    // (see TopKPerKey.scala) — the full logical/rule/strategy/exec ladder
    e.injectOptimizerRule(_ => RewriteRankFilterToTopK)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    // SQL DML (DELETE FROM / UPDATE / MERGE INTO) over graft.lake tables:
    // rewrite the resolved-but-v1-unsupported DML plans into the lake
    // mutations before checkAnalysis rejects them (see LakeSqlDml.scala)
    e.injectPostHocResolutionRule(s => graft.lake.LakeDmlRule(s))
    // SQL time travel (VERSION AS OF) over graft.lake tables — must run
    // BEFORE the main resolution (ResolveRelations rejects v1 time
    // travel outright), so it rides the hint-resolution batch
    e.injectHintResolutionRule(s => graft.lake.LakeTimeTravelRule(s))
    // manifest statistics (exact rowCount + per-column bounds) into the
    // CBO: lake relations stop being size-only black boxes, so filtered
    // facts broadcast unhinted when the estimated slice is small
    e.injectOptimizerRule(s => graft.lake.LakeCboStatsRule(s))
  }
}

/** Rewrites sum-of-products over zipped double arrays into the fused
  * codegen expression. Conservative: fires only on the exact shape with
  * double element types and a 0.0 seed, and leaves everything else
  * untouched (identity finish lambda included — `aggregate` without an
  * explicit finish uses the identity).
  */
object RewriteZipWithDot extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), zipArgs, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(accRef: NamedLambdaVariable, vRef: NamedLambdaVariable, _), aggArgs, _),
        LambdaFunction(finishBody: NamedLambdaVariable, finishArgs, _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          zipArgs.map(_.exprId).toSet == Set(x.exprId, y.exprId) &&
          aggArgs.map(_.exprId).toSet == Set(accRef.exprId, vRef.exprId) &&
          finishArgs.headOption.exists(_.exprId == finishBody.exprId) =>
      DotProduct(a, b)
  }
}
