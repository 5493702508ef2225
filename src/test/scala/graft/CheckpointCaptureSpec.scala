package graft

import org.apache.spark.sql.functions._

import graft.operators.CacheOps

/** Round-11 regression: `Dataset.localCheckpoint` captures the
  * physical plan's output partitioning/ordering onto the LogicalRDD
  * leaf, and over CATALOG tables the captured attribute INSTANCES can
  * differ from the leaf's own output attributes while sharing their
  * exprIds — the logical output carries the 3-part table qualifier,
  * the physical capture holds an unqualified twin.
  * `LogicalRDD.newInstance()` (the self-join dedup path) rewrites the
  * capture through an instance-keyed map, misses the unqualified
  * twin, and the renewed leaf reports `missingInput.nonEmpty` — which
  * makes `DeduplicateRelations` REFUSE to dedup the downstream
  * self-join (`noMissingInput` guard) and analysis dies with
  * INTERNAL_ERROR "Failure when resolving conflicting references in
  * Join". Observed on the whole percentile family (q_mad,
  * q_win_analytic, q_winsorize, …) over catalog tables with AQE off
  * (AQE on captures UnknownPartitioning from the unexecuted adaptive
  * root, hiding the bug).
  * [[CacheOps.truncated]]/[[CacheOps.finalized]]/`eagerCheckpoint`
  * canonicalize the capture onto the leaf's own output instances at
  * creation ([[org.apache.spark.sql.GraftSqlBridge.sanitizeCheckpointCapture]]);
  * this suite pins the end-to-end repro, the leaf invariant, and the
  * capture-preservation guarantee.
  */
class CheckpointCaptureSpec extends GraftSpecBase {

  test("percentile-family query over catalog tables analyzes and runs under AQE OFF (the qualifier-mismatch repro)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Tables.names.foreach(n => resetCatalogTable(s"r11cc_$n"))
      graft.plans.Layout.writeGradedCatalog(spark, sf, "r11cc")
      CacheOps.scoped {
        // the q_mad shape: grid-median of events joined back onto the
        // SAME events frame — the exact self-join that failed
        val out = SparkEntry.queries("q_mad")(spark, "catalog:r11cc")
          .collect()
        assert(out.nonEmpty, "q_mad over the catalog must return rows")
      }
      // and the leaf invariant directly: every checkpoint leaf in a
      // catalog-run query has its capture expressed in the leaf's OWN
      // output attribute INSTANCES (instance equality, not just
      // exprId-subset — the exprId check passes on the poisoned
      // capture too)
      CacheOps.scoped {
        val df = SparkEntry.queries("q_win_analytic")(spark, "catalog:r11cc")
        var leaves = 0
        df.queryExecution.analyzed.foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            leaves += 1
            val byId = l.output.map(a => a.exprId -> a).toMap
            val capAttrs = (l.outputPartitioning match {
              case e: org.apache.spark.sql.catalyst.expressions.Expression =>
                e.collect {
                  case a: org.apache.spark.sql.catalyst.expressions.Attribute => a
                }
              case _ => Nil
            }) ++ l.outputOrdering.flatMap(_.collect {
              case a: org.apache.spark.sql.catalyst.expressions.Attribute => a
            })
            capAttrs.foreach(a =>
              assert(byId.get(a.exprId).contains(a),
                s"capture attr $a (qualifier=${a.qualifier}) is not the " +
                  s"leaf's own output instance ${byId.get(a.exprId)}"))
          case _ =>
        }
        assert(leaves > 0, "expected at least one checkpoint leaf")
        assert(df.collect().nonEmpty)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("healthy captures pass through untouched: a parquet-path checkpoint keeps its partitioning capture") { CacheOps.scoped {
    // the sanitizer must not strip the capture planning relies on
    // (an Exchange-reuse/no-resort win for downstream same-key ops).
    // AQE off: under AQE the physical root is an unexecuted adaptive
    // plan whose partitioning is unknown at (lazy-)checkpoint time, so
    // there is no capture to preserve in the first place — the
    // non-adaptive plan is the posture where the capture exists.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val ev = Tables.events(spark, sf)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ck = CacheOps.truncated(ev.repartition(4, col("event_type")))
      org.apache.spark.sql.GraftSqlBridge.logicalPlan(ck) match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          assert(l.outputPartitioning.toString.contains("hashpartitioning"),
            s"healthy capture must be preserved, got ${l.outputPartitioning}")
        case other => fail(s"expected a LogicalRDD leaf, got $other")
      }
      assert(ck.count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  } }

  test("catalog-table capture is canonicalized, KEEPING the partitioning (not dropped to Unknown)") { CacheOps.scoped {
    // the fix must preserve the planning value of the capture — a
    // qualifier mismatch is repaired by instance rewrite, not by
    // discarding the partitioning
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      resetCatalogTable("r11cc_canon")
      Tables.events(spark, sf).write.saveAsTable("r11cc_canon")
      val t = spark.table("r11cc_canon")
      val grid = CacheOps.truncated(
        t.groupBy(col("event_type"), col("value"))
          .agg(count(lit(1)).as("c")))
      org.apache.spark.sql.GraftSqlBridge.logicalPlan(grid) match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          assert(l.outputPartitioning.toString.contains("hashpartitioning"),
            s"canonicalized capture must keep the partitioning, got " +
              s"${l.outputPartitioning}")
          val byId = l.output.map(a => a.exprId -> a).toMap
          l.outputPartitioning match {
            case e: org.apache.spark.sql.catalyst.expressions.Expression =>
              e.references.foreach(a =>
                assert(byId.get(a.exprId).contains(a),
                  s"capture ref $a must be the canonical output instance"))
            case _ =>
          }
        case other => fail(s"expected a LogicalRDD leaf, got $other")
      }
      // and the poisoned downstream shape now works: self-join of the
      // catalog frame against a grid-derived aggregate
      val agg = grid.groupBy("event_type").agg(max("c").as("m"))
      assert(t.join(broadcast(agg), Seq("event_type")).count() > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  } }
}
