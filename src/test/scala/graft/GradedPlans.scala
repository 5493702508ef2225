package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The executed physical plan of every graded query, built ONCE per
  * test JVM and shared by all whole-surface plan gates
  * ([[GlobalJoinSpec]], [[GlobalWindowSpec]], [[GlobalFunnelSpec]]).
  * Each suite previously built its own copy of all 536 plans (~2 min
  * per pass); `Test / fork := true` runs every suite in one JVM, so a
  * single shared pass serves them all.
  *
  * A query that fails to BUILD here throws, which fails whichever
  * gate suite touches the list first — same net effect as the old
  * per-suite `fail(...)`, still build-failing.
  */
object GradedPlans {

  private def strip(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Fixture columns whose domain is bounded by a small constant at
    * ANY scale factor (TPC-H spec constants / TESTDATA generators),
    * including the aliases graded queries give them. Shared by every
    * gate that reasons about per-key funnels: a partition spec, join
    * key set, or sort key set containing at least one column NOT in
    * this set is assumed scale-parallel and skipped.
    * (ScaleProbe in main mirrors this list — keep in sync.) */
  val lowCardNames: Set[String] = Set(
    "event_type", "o_orderpriority", "pri", "lang", "l_returnflag",
    "l_linestatus", "o_orderstatus", "c_mktsegment", "source", "split",
    "flag", "grp", "arm", "cohort", "band", "is_weekend", "label",
    // TPC-H spec constants: 25 nations, 5 regions, 25 brands, 5
    // segments — a 25-way funnel is still a funnel at 100 TB
    "n_name", "n_nationkey", "r_name", "r_regionkey", "p_brand",
    "brand", "p_mfgr", "nation", "region", "mktsegment", "seg",
    "status", "p_container", "shipmode", "l_shipmode")

  /** True when every row reaching this subtree's output passed
    * through a row-contracting operator (aggregate, limit, rank
    * limit) or comes from a constant-size source — i.e. an operator
    * above it does NOT see raw fact-scale rows. Joins/unions stay
    * contracted only if ALL inputs are. Conservative in the right
    * direction for a gate: an unrecognized leaf is uncontracted
    * (including the RDD-scan leaves that lazy localCheckpoint plants —
    * a checkpointed frame needs a documented allowlist bound). */
  def contractedBelow(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec |
         _: org.apache.spark.sql.execution.CollectLimitExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case f: org.apache.spark.sql.execution.FileSourceScanExec =>
      val path = f.relation.location.rootPaths.mkString(",")
      path.contains("nation") || path.contains("region")
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.numElements <= BigInt(65536)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      contractedBelow(j.left) && contractedBelow(j.right)
    case u: org.apache.spark.sql.execution.UnionExec =>
      u.children.forall(contractedBelow)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      contractedBelow(r.child)
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(contractedBelow)
  }

  lazy val atSf0001: Seq[(String, SparkPlan)] = {
    val spark = GraftSpecBase.session
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          throw new AssertionError(
            s"$name failed to build at $sf: ${e.getMessage}", e) }
      name -> strip(df.queryExecution.executedPlan)
    }
  }
}
