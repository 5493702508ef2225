package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Pre-checkpoint logical plans, keyed by the checkpointed RDD's id.
  *
  * `localCheckpoint` (the lineage-truncation idiom every unrolled
  * iterative query here uses — q_kcore_peel, q_ipf_rake, q_huber …)
  * replaces the subtree with a LogicalRDD / RDDScanExec leaf, which
  * the structural scale proofs ([[ScaleRules.contractedBelow]] /
  * [[ScaleRules.boundedLogical]]) cannot see through: round 6 covered
  * the two resulting blind spots (q_ipf_rake's bounded sort input;
  * GraphDist's builder interior) with source comments plus an
  * allowlist entry and a manual sweep protocol. Round 7 closes them
  * structurally: [[graft.operators.CacheOps.truncated]] registers the
  * pre-checkpoint plan here, and the proofs (and the gate suites'
  * interior sweeps) recurse into it — transitively, since an
  * iterative query's round-N plan ends at round N−1's checkpoint
  * leaf, whose own registration continues the chain.
  *
  * Size: entries accumulate per checkpoint call (a few hundred per
  * full Verify/Bench pass — each registered plan is ONE round's
  * truncated tree, small by construction). Driver-side only, never
  * shipped to executors.
  */
object CheckpointRegistry {

  private val plans = new ConcurrentHashMap[Int, LogicalPlan]()

  /** Record `pre`'s optimized plan as the provenance of the
    * checkpointed frame `out` (whose analyzed plan is a LogicalRDD).
    * No-op if `out` is not a checkpoint leaf. Returns `out`. */
  def register(out: DataFrame, pre: DataFrame): DataFrame = {
    out.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        plans.put(l.rdd.id, pre.queryExecution.optimizedPlan)
      case _ =>
    }
    out
  }

  def lookup(rddId: Int): Option[LogicalPlan] = Option(plans.get(rddId))

  /** Drop a checkpoint's provenance entry. Called by
    * [[graft.operators.CacheOps.scoped]] when a scope releases its
    * checkpoint blocks (round-9 ADVICE: without this, a long-lived
    * job-server session retains one optimized LogicalPlan per
    * checkpoint FOREVER — the lifecycle hook released the executor
    * blocks but leaked the driver-side plan). The gate suites build
    * their plans OUTSIDE any scope, so gate transparency is
    * unaffected: a registered interior lives exactly as long as the
    * checkpointed frame it describes is live. */
  def deregister(rddId: Int): Unit = { plans.remove(rddId); () }

  /** Live entry count — lifecycle specs pin that a scoped run returns
    * the registry to its pre-scope size (no driver-plan leak). */
  def size: Int = plans.size()

  /** All registered plans reachable from `p`'s checkpoint leaves,
    * transitively — lets whole-plan sweeps (hint audits, funnel
    * gates) cover checkpointed interiors instead of stopping at the
    * leaf. Includes `p` itself.
    *
    * Round-9 (ADVICE): interiors are deduped by checkpoint RDD id,
    * not plan structural equality — two DISTINCT checkpoints with
    * structurally-equal interiors are two materializations that each
    * scan their tables once, so each contributes its interior to the
    * census. The SAME checkpoint referenced twice (a self-join of one
    * materialized frame) still counts once: one materialization, one
    * physical read. Checkpoint leaves inside subquery-expression
    * plans are reached too (`subqueriesAll` — `foreach` alone does
    * not descend into them). */
  def expand(p: LogicalPlan): Seq[LogicalPlan] = {
    val seenIds = scala.collection.mutable.Set[Int]()
    val out = scala.collection.mutable.ArrayBuffer[LogicalPlan]()
    def go(plan: LogicalPlan): Unit = {
      out += plan
      (Iterator(plan) ++ plan.subqueriesAll.iterator).foreach(_.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD
            if !seenIds.contains(l.rdd.id) =>
          seenIds += l.rdd.id
          lookup(l.rdd.id).foreach(go)
        case _ =>
      })
    }
    go(p)
    out.toSeq
  }
}
