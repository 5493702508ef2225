package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters,
  * needed to expose custom Catalyst expressions (graft.functions.
  * expressions.*) through the public Column API. The Spark-internal
  * surface used is two stable one-liners; everything else of the
  * engine integration stays on public APIs. */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
