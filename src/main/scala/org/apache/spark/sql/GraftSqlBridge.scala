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

  /** Round-11: `Dataset.checkpoint`/`localCheckpoint` captures the
    * PHYSICAL plan's output partitioning/ordering onto the LogicalRDD
    * leaf (`LogicalRDD.fromDataset`), and the captured ATTRIBUTE
    * INSTANCES can differ from the leaf's own output attributes even
    * when the exprIds match — observed over CATALOG tables, where the
    * logical output carries the 3-part qualifier
    * (`spark_catalog.default.t`.value#4) but the physical capture
    * holds an UNQUALIFIED value#4. `LogicalRDD.newInstance()` (the
    * self-join deduplication path) rewrites the capture through an
    * instance-keyed map built from the output attributes —
    * `AttributeReference.equals` includes the qualifier, so the
    * mismatched instance is NOT rewritten and survives renewal as a
    * dangling reference. The renewed leaf then reports
    * `missingInput.nonEmpty`, which makes `DeduplicateRelations`
    * REFUSE to dedup any downstream self-join (its `noMissingInput`
    * guard), and analysis dies with INTERNAL_ERROR "Failure when
    * resolving conflicting references in Join" — reproduced on the
    * whole percentile family over catalog tables with AQE off (AQE on
    * captures UnknownPartitioning from the unexecuted adaptive root,
    * hiding the bug).
    *
    * Fix at creation: CANONICALIZE every attribute inside the capture
    * onto the leaf's own output instance with the same exprId — the
    * planning value of the capture (exchange reuse downstream) is
    * preserved, and newInstance's rewrite map now hits every
    * reference. A capture referencing an exprId absent from the
    * output entirely carries no usable planning information → that
    * part drops to Unknown/Nil. Healthy leaves pass through
    * untouched; stats and constraint provenance are preserved on
    * rebuild. */
  def sanitizeCheckpointCapture(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, UnknownPartitioning}
    import org.apache.spark.sql.execution.LogicalRDD
    logicalPlan(df) match {
      case l: LogicalRDD =>
        val byId = l.output.map(a => a.exprId -> a).toMap
        // rewrite capture attrs onto the canonical output instances;
        // None = some exprId has no output column at all (dangling)
        def canon(e: Expression): Option[Expression] = {
          var ok = true
          val rewritten = e.transform {
            case a: Attribute => byId.get(a.exprId) match {
              case Some(ownAttr) => ownAttr
              case None => ok = false; a
            }
          }
          if (ok) Some(rewritten) else None
        }
        val (newPart, partChanged) = l.outputPartitioning match {
          case e: Expression =>
            canon(e) match {
              case Some(c) if c == e => (l.outputPartitioning, false)
              case Some(c) => (c.asInstanceOf[Partitioning], true)
              case None =>
                (UnknownPartitioning(l.rdd.getNumPartitions), true)
            }
          case p => (p, false)
        }
        val canonOrd = l.outputOrdering.map(so => canon(so))
        val (newOrd, ordChanged) =
          if (canonOrd.contains(None)) (Nil, l.outputOrdering.nonEmpty)
          else {
            val c = canonOrd.map(_.get.asInstanceOf[SortOrder])
            (c, c != l.outputOrdering)
          }
        if (!partChanged && !ordChanged) df
        else {
          // second constructor list (session/originStats/
          // originConstraints) has no public accessors — reflect them
          // so the rebuilt leaf keeps the original's statistics and
          // constraint provenance
          def priv[T](name: String): T = {
            val f = classOf[LogicalRDD].getDeclaredField(name)
            f.setAccessible(true)
            f.get(l).asInstanceOf[T]
          }
          ofRows(df.sparkSession, new LogicalRDD(
            l.output, l.rdd, newPart, newOrd,
            l.isStreaming, l.stream)(
            priv[classic.SparkSession]("session"),
            priv[Option[org.apache.spark.sql.catalyst.plans.logical.Statistics]](
              "originStats"),
            priv[Option[org.apache.spark.sql.catalyst.expressions.ExpressionSet]](
              "originConstraints")))
        }
      case _ => df
    }
  }
}
