package graft.functions.expressions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whitespace token counter (sixth custom expression):
  * `space_tokens(s)` ≡ `size(split(s, " "))` — the number of
  * single-space-separated segments, i.e. (count of ' ' bytes) + 1,
  * with empty segments counted exactly as Spark's `split` keeps them
  * (limit −1 semantics; `""` → 1). Value-identical to the composed
  * form — pinned by SpaceTokensSpec over every document plus edge
  * cases — and to DuckDB's `len(string_split(s, ' '))`.
  *
  * Why an expression: the composed form materializes a full
  * UTF8String ARRAY per row just to read its length — on a token-
  * counting pass over 100 TB of text that allocation IS the cost.
  * This kernel is a single byte scan (0x20 never occurs inside a
  * UTF-8 multibyte sequence, so byte == char counting is exact), runs
  * inside whole-stage codegen, and allocates nothing.
  */
case class SpaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"space_tokens needs a string arg, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    SpaceTokens.count(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SpaceTokens.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SpaceTokens =
    copy(child = newChild)
}

object SpaceTokens {

  /** Column-API entry point. */
  def spaceTokens(s: Column): Column =
    GraftSqlBridge.toColumn(SpaceTokens(GraftSqlBridge.toExpression(s)))

  /** Static kernel (interpreted eval + generated code). */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var i = 0
    var n = 1
    while (i < bytes.length) {
      if (bytes(i) == 0x20) n += 1
      i += 1
    }
    n
  }
}
