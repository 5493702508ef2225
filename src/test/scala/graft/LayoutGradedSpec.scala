package graft

import org.apache.spark.sql.functions._

import graft.plans.Layout

/** Round-10 (verdict item 4): graded queries executed over the
  * PRODUCTION [[Layout]] — not toy frames. [[LayoutSpec]] proves the
  * bucketed no-shuffle join and DPP on purpose-built tables; this
  * suite writes the graded sf fixtures through
  * `Layout.writeBucketed` into the session catalog and runs a
  * representative graded subset (flagship star join, as-of join,
  * sessionization, exact dedup, multimodal join) against it via the
  * `catalog:<prefix>` dir scheme ([[Tables.table]]). Asserts:
  *
  *  1. results are IDENTICAL to the parquet run — the 100 TB layout
  *     is a physical choice, never a semantics change;
  *  2. the flagship's lineitem⋈orders join is EXCHANGE-FREE over the
  *     bucketed tables (broadcast disabled to force the join the
  *     cluster posture would plan) — the single biggest shuffle
  *     eliminated by the layout, proven on a graded query rather
  *     than a demo frame.
  */
class LayoutGradedSpec extends GraftSpecBase {

  private val prefix = "g10"
  private val dir = s"catalog:$prefix"


  /** One-time write of the full fixture set through the production
    * layout — the SHARED writer Verify's SPARK_GRAFT_LAYOUT dial uses
    * (round-11: facts bucketed by their dominant join key, events
    * date-partitioned + user-bucketed via writePartitionedBucketed,
    * dims plain — so this suite covers the exact write path the full
    * catalog sweep certifies, including the layout-only `event_date`
    * partition column Tables drops on read). */
  private lazy val written: Unit = {
    Tables.names.foreach(n => resetCatalogTable(s"${prefix}_$n"))
    Layout.writeGradedCatalog(spark, sf, prefix, buckets = 8)
  }

  private val subset = Seq("q_join_star", "q_join_asof", "q_win_session",
    "q_dedup_exact", "q_multimodal_join")

  test("graded queries over the bucketed Layout catalog are value-identical to the parquet run") {
    written
    subset.foreach { name =>
      val fromParquet = SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      val fromLayout = SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(fromLayout == fromParquet,
        s"$name over the Layout catalog differs from the parquet run")
      assert(fromLayout.nonEmpty, s"$name returned no rows — vacuous")
    }
  }

  test("the census classifies catalog-layout scans (no unknowns over the bucketed catalog)") {
    written
    // the round-10 tableOfPaths suffix matcher on REAL bucketed-table
    // plans: a deployment that adopts the Layout write path keeps
    // full scan-census coverage — fact-gate decisions would otherwise
    // silently stop firing for every bucketed table
    val q = SparkEntry.queries("q_join_star")(spark, dir)
    val counts = graft.plans.ScanCensus.tableScanCounts(
      graft.plans.CheckpointRegistry.expand(q.queryExecution.optimizedPlan))
    assert(counts.getOrElse("unknown", 0) == 0,
      s"catalog scans must classify, got $counts")
    assert(counts.getOrElse("lineitem", 0) == 1 &&
      counts.getOrElse("orders", 0) == 1, counts.toString)
  }

  test("the flagship's lineitem⋈orders is exchange-free over the bucketed layout") {
    written
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the cluster-posture plan: at 100 TB neither fact side
      // broadcasts, so the orderkey join must ride the bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = SparkEntry.queries("q_join_star")(spark, dir)
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(3000))
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed lineitem must not shuffle on its join key:\n" + p.take(3000))
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed orders must not shuffle on its join key:\n" + p.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
