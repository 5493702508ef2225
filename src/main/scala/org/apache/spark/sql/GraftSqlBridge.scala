package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to the `private[sql]` Column↔Expression converters,
  * needed to expose custom Catalyst expressions (graft.functions.
  * expressions.*) and custom logical plans (graft.plans.*) through
  * the public DataFrame API. The Spark-internal surface used is four
  * stable one-liners; everything else of the engine integration stays
  * on public APIs. */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan
  /** Eagerly convert a Column's node tree to a Catalyst Expression
    * (toExpression's lazy ColumnNodeExpression wrapper is only
    * unwrapped by the standard DataFrame entry points — a custom
    * LogicalPlan built directly needs the converted form so the
    * analyzer can resolve it). */
  def resolvedExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
