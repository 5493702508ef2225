package graft.operators

import org.apache.spark.sql.DataFrame

import graft.plans.CheckpointRegistry

/** Cache + lineage hygiene for query builders that persist or
  * checkpoint an intermediate (iterative graph algorithms,
  * pair-generation barriers): persisted blocks otherwise accumulate in
  * executor storage memory across a multi-hundred-query bench run
  * (round-3 advice), and unrolled iterations replicate their plan tree
  * multiplicatively without per-round truncation (round-6).
  *
  * [[finalized]] materializes the (small — these results are
  * dimension-sized) result with an EAGER `localCheckpoint`, which cuts
  * the lineage back to the persisted intermediate, then unpersists the
  * intermediates. The caller gets a self-contained DataFrame; the
  * cache's storage is released immediately instead of at session end.
  *
  * [[truncated]] is the LAZY per-round form (lineage truncation +
  * cached-RDD dedup, no extra jobs — the eager form was A/B-measured
  * and rejected in round 6 for taxing the concurrent bench ~8 s).
  * Both register the pre-checkpoint logical plan in
  * [[graft.plans.CheckpointRegistry]] so the scale gates' structural
  * proofs see through the RDD-scan leaf the checkpoint plants —
  * previously the two blind spots behind these leaves were covered by
  * source comments and an allowlist entry (round-6 verdict item 6).
  */
object CacheOps {
  def finalized(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint() // eager: runs the query now
    cached.foreach(_.unpersist())
    CheckpointRegistry.register(out, result)
  }

  /** Lazy localCheckpoint with gate-visible provenance. */
  def truncated(df: DataFrame): DataFrame =
    CheckpointRegistry.register(df.localCheckpoint(eager = false), df)

  /** True when every leaf of `df`'s analyzed plan is already
    * materialization-backed (checkpointed RDD, local relation, small
    * range) — i.e. re-executing the frame touches no base-table scan.
    * Operators that materialize their input for branch fan-out
    * (PrefixOps) skip the checkpoint then: re-deriving a projection
    * from cached rows per branch is cheaper than a second cached
    * copy. */
  def scanFree(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectLeaves().forall {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => true
      case r: org.apache.spark.sql.catalyst.plans.logical.Range =>
        r.numElements <= BigInt(65536)
      case _ => false
    }

  /** Chain-friendly forms of [[truncated]]/[[finalized]]'s
    * registration, so call sites keep their method-chain shape. */
  implicit class CheckpointSyntax(private val df: DataFrame)
      extends AnyVal {
    /** Lazy `localCheckpoint(eager = false)` + registry. */
    def truncatedCheckpoint(): DataFrame = truncated(df)
    /** Eager `localCheckpoint()` + registry. */
    def eagerCheckpoint(): DataFrame =
      CheckpointRegistry.register(df.localCheckpoint(), df)
  }
}
