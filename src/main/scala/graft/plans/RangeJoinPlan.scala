package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** First-class point-in-interval (range) join (SURVEY.md §4 optional
  * row (d), second instance — same LogicalPlan + SparkStrategy +
  * SparkPlan tier as [[AsOfJoin]]).
  *
  * Semantics: INNER join of a point side against an interval side on
  * `start <= point < end` (half-open, the calendar-bucket
  * convention); a point row is emitted once per containing interval.
  *
  * Why a custom operator: Spark plans a non-equi condition like this
  * as BroadcastNestedLoopJoin — every left row probes EVERY interval,
  * O(n·m) predicate evaluations. This exec broadcasts the (small,
  * dimension-sized) interval side once, sorts it by start inside each
  * task, requires the point side sorted by point (EnsureRequirements
  * inserts the sort — and often gets it free from an upstream sort or
  * range exchange), and sweeps: intervals enter an active heap when
  * `start <= p`, leave when `end <= p`. Per partition the cost is
  * O(n log a + m log m + matches) with a = max concurrent overlap —
  * at 100 TB the point side stays fully distributed, the sweep state
  * is bounded by interval overlap (1 for calendar buckets), and no
  * pair row ever materializes except actual matches.
  */
case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    point: Expression,
    start: Expression,
    end: Expression) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** Push deterministic single-side filter conjuncts through RangeJoin
  * into the matching child — sound on BOTH sides for an inner join
  * (each output row exists iff its left and right constituents do).
  * Catalyst's PushDownPredicates cannot see into custom nodes. */
object RangeJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: RangeJoin) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val toLeft = conjuncts.filter(p => p.deterministic &&
        p.references.subsetOf(j.left.outputSet))
      val toRight = conjuncts.filter(p => p.deterministic &&
        p.references.subsetOf(j.right.outputSet))
      val keep = conjuncts.filterNot(p => toLeft.contains(p) || toRight.contains(p))
      if (toLeft.isEmpty && toRight.isEmpty) f
      else {
        val newLeft = toLeft.reduceOption(And).map(Filter(_, j.left)).getOrElse(j.left)
        val newRight = toRight.reduceOption(And).map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner rule: RangeJoin → RangeJoinExec. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, p, s, e) =>
      RangeJoinExec(p, s, e, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(
    point: Expression,
    start: Expression,
    end: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Point side stays as-is (fully distributed); interval side is
    * broadcast whole to every task — the dimension-table contract. */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  /** The sweep needs the point side ordered by the point. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(point, Ascending)), Nil)

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(point, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val pointE = point
    val startE = start
    val endE = end
    val tType = point.dataType
    val outputSchema = output
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions ({ lIter =>
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(tType))
      val pProj = UnsafeProjection.create(Seq(pointE), lOut)
      val sProj = UnsafeProjection.create(Seq(startE), rOut)
      val eProj = UnsafeProjection.create(Seq(endE), rOut)
      val outProj = UnsafeProjection.create(outputSchema, outputSchema)
      val joiner = new JoinedRow
      // task-local copy of the intervals, (start, end) extracted once,
      // sorted by start — the broadcast array is shared across tasks,
      // so never mutate it. Intervals with a NULL bound are dropped
      // up front: `start <= p < end` is UNKNOWN in SQL when either
      // bound is NULL, so such rows can never match (natural ordering
      // would otherwise rank NULL smallest and admit a NULL-start
      // interval for EVERY point).
      val intervals: Array[(UnsafeRow, UnsafeRow, InternalRow)] =
        broadcastRows.value.flatMap { r =>
          val s = sProj(r)
          val e = eProj(r)
          if (s.isNullAt(0) || e.isNullAt(0)) None
          else Some((s.copy(), e.copy(), r))
        }.sortWith((a, b) => ord.compare(a._1, b._1) < 0)
      var cursor = 0
      // active intervals, min-heap on end for O(log a) eviction
      val active = new java.util.PriorityQueue[(UnsafeRow, InternalRow)](
        math.max(1, intervals.length),
        (a: (UnsafeRow, InternalRow), b: (UnsafeRow, InternalRow)) =>
          ord.compare(a._1, b._1))

      lIter.flatMap { lRow =>
        val p = pProj(lRow).copy()
        // NULL point: the range predicate is UNKNOWN for every
        // interval — emit nothing (matches SQL / the BNLJ baseline).
        // NULLs sort first in the required ascending order, so these
        // rows precede the sweep and advance no state.
        if (p.isNullAt(0)) Iterator.empty
        else {
        // admit intervals whose start <= p
        while (cursor < intervals.length &&
            ord.compare(intervals(cursor)._1, p) <= 0) {
          active.add((intervals(cursor)._2, intervals(cursor)._3))
          cursor += 1
        }
        // evict intervals whose end <= p (half-open)
        while (!active.isEmpty && ord.compare(active.peek()._1, p) <= 0) {
          active.poll()
        }
        if (active.isEmpty) Iterator.empty
        else {
          val it = active.iterator()
          new Iterator[InternalRow] {
            override def hasNext: Boolean = it.hasNext
            override def next(): InternalRow =
              outProj(joiner(lRow, it.next()._2))
          }
        }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinPlan {

  /** DataFrame-level API: inner point-in-interval join — each `left`
    * row joined to every `right` row with `start <= point < end`.
    * Columns must resolve against their respective inputs, and the
    * two sides need disjoint column names. */
  def pointInRange(left: DataFrame, right: DataFrame,
      point: Column, start: Column, end: Column): DataFrame = {
    val s = left.sparkSession
    def expr(c: Column) = GraftSqlBridge.resolvedExpression(s, c)
    GraftSqlBridge.ofRows(s,
      RangeJoin(
        GraftSqlBridge.logicalPlan(left),
        GraftSqlBridge.logicalPlan(right),
        expr(point), expr(start), expr(end)))
  }
}
