package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** First-class backward as-of join (SURVEY.md §2-B #15, §4 optional
  * row (d) — the custom-operator tier: LogicalPlan + SparkStrategy +
  * SparkPlan, registered through SparkSessionExtensions /
  * `spark.experimental.extraStrategies`).
  *
  * Semantics: LEFT OUTER as-of — every left row joins the single
  * right row with equal keys and the greatest `rightTime <=
  * leftTime`; ties on `rightTime` break by the trailing `rightTie`
  * ordering (callers pass a unique column to make the winner
  * deterministic). Unmatched left rows null-extend.
  *
  * Why a custom operator instead of the compositional forms:
  *  - join + window/row_number: materializes EVERY (left, right)
  *    candidate pair, then sorts them per left row — O(pairs) memory
  *    and shuffle.
  *  - join + max(struct) aggregation (q_join_asof's shape): map-side
  *    combine helps, but the pair blow-up still happens before the
  *    aggregation — a user with s signups and p purchases costs s·p
  *    intermediate rows.
  *  - THIS exec: both sides hash-partitioned on the keys (the same
  *    ClusteredDistribution contract SortMergeJoin uses, so
  *    EnsureRequirements co-partitions them) and sorted by
  *    (keys, time); one O(n+m) merge scan per partition, constant
  *    per-key state (a single held candidate row), zero pair
  *    materialization. At 100 TB this is the only shape whose cost
  *    does not depend on key density.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push left-referencing filter conjuncts through
  * AsOfJoin into the left child (Catalyst's PushDownPredicates does
  * not descend into custom nodes, so without this a filter above the
  * join never reaches the parquet scan). Left-only predicates are
  * safe: the join emits every left row exactly once, so pre-filtering
  * the left side is equivalent. Right-referencing predicates must NOT
  * push — they would change the candidate set rather than filter the
  * join's output (e.g. `signup_ts IS NOT NULL` on the null-extended
  * output vs dropping rows before matching). */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner rule: AsOfJoin → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTie: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Same contract as SortMergeJoinExec: cluster both sides on the
    * join keys; EnsureRequirements inserts compatible hash exchanges
    * (co-partitioning both sides). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Sorted merge input: (keys, time) on the left, (keys, time, tie)
    * on the right — the tie columns make the last-row-wins choice on
    * equal timestamps deterministic. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTie)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture ONLY serializable state (expressions, attributes); the
    // codegen'd projections/orderings are generated per partition —
    // generated classes don't serialize, and touching `left`/`right`
    // inside the closure would drag the whole SparkPlan along
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nRight = rOut.size
    val outputSchema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrder = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(keyTypes)
      val timeOrder = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(timeType))
      val outProj = UnsafeProjection.create(outputSchema, outputSchema)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      // buffered right cursor
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // held candidate: the latest right row (keys equal to the held
      // key) seen so far with time <= the current left time
      var candKey: InternalRow = null
      var cand: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow)
        // drop a held candidate from a previous (smaller) key group
        if (cand != null && keyOrder.compare(candKey, lKey) != 0) {
          cand = null; candKey = null
        }
        // advance the right side while it is behind (key < lKey) or
        // inside the window (key == lKey && time <= lTime); the last
        // in-window row becomes the candidate
        var advancing = rRow != null
        while (advancing) {
          val rKey = rKeyProj(rRow)
          val c = keyOrder.compare(rKey, lKey)
          if (c < 0) {
            rRow = if (rIter.hasNext) rIter.next() else null
            advancing = rRow != null
          } else if (c == 0 &&
              timeOrder.compare(rTimeProj(rRow), lTime) <= 0) {
            cand = rRow.copy() // iterator reuses its UnsafeRow buffer
            candKey = lKey.copy()
            rRow = if (rIter.hasNext) rIter.next() else null
            advancing = rRow != null
          } else {
            advancing = false
          }
        }
        val matched = cand != null && keyOrder.compare(candKey, lKey) == 0
        outProj(joiner(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** DataFrame-level API: backward as-of join of `left` and `right`.
    * Key/time/tie columns must be resolved against the respective
    * inputs (`df("col")`); callers give the two sides disjoint column
    * names (as with any self-join). */
  def asof(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      rightTie: Seq[Column] = Nil): DataFrame = {
    val s = left.sparkSession
    def expr(c: Column) = GraftSqlBridge.resolvedExpression(s, c)
    GraftSqlBridge.ofRows(s,
      AsOfJoin(
        GraftSqlBridge.logicalPlan(left),
        GraftSqlBridge.logicalPlan(right),
        leftKeys.map(expr), rightKeys.map(expr),
        expr(leftTime), expr(rightTime), rightTie.map(expr)))
  }
}
