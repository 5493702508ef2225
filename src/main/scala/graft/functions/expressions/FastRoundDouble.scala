package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `round(child, scale)` for a DoubleType child — bit-identical to
  * Spark's `Round` (HALF_UP) by the [[graft.functions.FastRound]]
  * contract, without the per-row `Double.toString` + string-parsed
  * BigDecimal round-trip on the overwhelmingly common unambiguous
  * cases. Planted by [[graft.plans.FastRoundRewrite]]; never written
  * by query code directly (queries keep the declarative
  * `functions.round`).
  */
case class FastRoundDouble(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale >= 0 && scale <= graft.functions.FastRound.MaxScale,
    s"FastRoundDouble scale out of range: $scale")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"FastRoundDouble needs a double child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    graft.functions.FastRound.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.FastRound.round($c, $scale)")

  override def prettyName: String = "fast_round"

  override protected def withNewChildInternal(
      newChild: Expression): FastRoundDouble = copy(child = newChild)
}
