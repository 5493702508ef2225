package graft

import org.apache.spark.sql.functions._

import graft.operators.CacheOps
import graft.plans.{CheckpointRegistry, ScanCensus}

/** Unit pins for the round-8 scan-census machinery itself — the
  * counting rules GlobalScanSpec's whole-surface sweep relies on.
  * The gate's detector self-test proves end-to-end behavior; these
  * pin the individual rules so a refactor cannot silently change
  * what "a scan" means.
  */
class ScanCensusSpec extends GraftSpecBase {

  private def census(df: org.apache.spark.sql.DataFrame) =
    ScanCensus.tableScanCounts(
      CheckpointRegistry.expand(df.queryExecution.optimizedPlan))

  test("each logical occurrence of a base relation counts once; dims and facts both appear") {
    val n = Tables.nation(spark, sf)
    val e = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val joined = e.join(broadcast(n.select(col("n_nationkey"))),
      col("value") > col("n_nationkey"))
    val c = census(joined)
    assert(c.getOrElse("events", 0) == 1 && c.getOrElse("nation", 0) == 1, c)
    // a self-join embeds the relation twice
    val self = e.as("a").join(e.as("b"), Seq("event_type"))
    assert(census(self).getOrElse("events", 0) == 2)
  }

  test("tableOfPaths: innermost segment wins (leaf-to-root) and catalog-layout tables classify (round-10 ADVICE + Layout census)") {
    def of(p: String) = ScanCensus.tableOfPaths(
      Seq(new org.apache.hadoop.fs.Path(p)))
    // the ADVICE shape: a path containing TWO table-name segments must
    // classify by the innermost (declaration order said 'part')
    assert(of("/data/part/lineitem/part-00001.parquet") == Some("lineitem"))
    assert(of("/data/lineitem/part/part-00001.parquet") == Some("part"))
    // plain graded layout unchanged
    assert(of("/root/testdata/sf0.001/orders.parquet") == Some("orders"))
    // the Layout/catalog layout: warehouse/<prefix>_<table>/bucket files
    assert(of("spark-warehouse/g10_lineitem/part-00000-abc.c000.snappy.parquet")
      == Some("lineitem"))
    assert(of("spark-warehouse/g10_events/part-00000.parquet") == Some("events"))
    // no false positives from part-file names or unrelated segments
    assert(of("/data/misc/notatable/part-00000.parquet").isEmpty)
    // round-11 (ADVICE): the `_<table>` suffix match is scoped to
    // segments DIRECTLY under a warehouse root — an unrelated
    // directory that merely ends with a table name must NOT classify
    // (it would misattribute census counts and could trip
    // factOffenders falsely)
    assert(of("/data/backup_orders/part-00001.parquet").isEmpty)
    assert(of("/data/nightly/dump_lineitem/part-00001.parquet").isEmpty)
    // …but the same shape under the warehouse still classifies
    assert(of("/x/spark-warehouse/dump_lineitem/part-1.parquet")
      == Some("lineitem"))
  }

  test("factOffenders flags only fact tables above the limit, never dims") {
    val n = Tables.nation(spark, sf).select(col("n_nationkey"))
    val manyDims = (1 to 6).map(_ => n).reduce(_ unionByName _)
    assert(ScanCensus.factOffenders(CheckpointRegistry.expand(
      manyDims.queryExecution.optimizedPlan), maxScans = 3).isEmpty,
      "re-reading a 25-row dim is free at any scale")
    val e = Tables.events(spark, sf).select(col("event_id"))
    val manyFacts = (1 to 6).map(_ => e).reduce(_ unionByName _)
    val off = ScanCensus.factOffenders(CheckpointRegistry.expand(
      manyFacts.queryExecution.optimizedPlan), maxScans = 3)
    assert(off.get("events").exists(_ > 3), off)
  }

  test("a checkpointed frame counts its interior once however many branches consume it") {
    import CacheOps.CheckpointSyntax
    val grid = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .truncatedCheckpoint()
    val fanned = (1 to 5).map(_ => grid.select(col("event_type"), col("n")))
      .reduce(_ unionByName _)
    assert(census(fanned).getOrElse("events", 0) == 1,
      "5 branches over one checkpoint leaf must count the interior scan once")
  }

  test("two DISTINCT checkpoints with structurally-equal interiors count twice (round-9 ADVICE: dedupe by RDD id, not structure)") {
    import CacheOps.CheckpointSyntax
    def mk() = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .truncatedCheckpoint()
    val a = mk()
    val b = mk() // separate materialization: scans events again
    val both = a.unionByName(b)
    assert(census(both).getOrElse("events", 0) == 2,
      "each distinct checkpoint is its own materialization — its interior " +
        "scan must count even when another checkpoint's interior is " +
        "structurally identical")
  }

  test("a persisted frame's interior scans are visible to the census, and count once per cache (round-9)") {
    val e = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).persist()
    try {
      // two branches over ONE cache: the interior's events scan counts
      // once (one materialization), same convention as checkpoints
      val fanned = e.filter(col("value") > 50)
        .unionByName(e.filter(col("value") <= 50))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val c = census(fanned)
      assert(c.getOrElse("events", 0) == 1,
        s"persist interior must count its scan exactly once, got $c")
      // and a cache-backed frame joined with a DIRECT scan counts both
      val mixed = e.join(Tables.events(spark, sf)
        .select(col("event_type")).distinct(), Seq("event_type"))
      assert(census(mixed).getOrElse("events", 0) == 2)
    } finally e.unpersist()
  }

  test("an EXCHANGE-BEARING persisted interior (AQE-wrapped cachedPlan) still counts its scans (round-9 review)") {
    // on Spark 4.1.2 a cachedPlan containing any exchange is an
    // AdaptiveSparkPlanExec LEAF — the census must unwrap it, or
    // join/aggregate interiors (exactly the expensive ones) count 0
    val e = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).persist()
    try {
      assert(e.queryExecution.optimizedPlan.collectLeaves().exists {
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          m.cachedPlan.isInstanceOf[
            org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
        case _ => false
      }, "precondition: this fixture must produce an AQE-wrapped cachedPlan " +
        "(if Spark stops wrapping, this test needs a new fixture)")
      val c = census(e.select(col("event_type"), col("n")))
      assert(c.getOrElse("events", 0) == 1,
        s"the aggregate interior's events scan must count through AQE, got $c")
      // a persisted JOIN of two facts counts both interiors' scans
      val j = Tables.events(spark, sf).select(col("user_id"))
        .join(Tables.customer(spark, sf).select(
          col("c_custkey").as("user_id")), Seq("user_id")).persist()
      try {
        val cj = census(j.select(col("user_id")))
        assert(cj.getOrElse("events", 0) == 1 &&
          cj.getOrElse("customer", 0) == 1,
          s"join interior scans must count through AQE, got $cj")
      } finally j.unpersist()
    } finally e.unpersist()
  }

  test("cacheInteriors exposes a BaseJoinExec inside an AQE-wrapped persisted interior (round-9 review: the gate sweep is not vacuous)") {
    val j = Tables.events(spark, sf).select(col("user_id"))
      .join(Tables.customer(spark, sf).select(
        col("c_custkey").as("user_id")), Seq("user_id")).persist()
    try {
      val consumer = j.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val top = consumer.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      val interiors = GradedPlans.cacheInteriors(top)
      assert(interiors.nonEmpty, "the persisted interior must be swept")
      val joins = interiors.flatMap(_.collect {
        case b: org.apache.spark.sql.execution.joins.BaseJoinExec => b })
      assert(joins.nonEmpty,
        "a join inside the persisted interior must be visible to " +
          "collect-based gates (AQE unwrapped)")
    } finally j.unpersist()
  }

  test("a scalar subquery's scan is visible to the census (round-9 ADVICE: subqueriesAll)") {
    val e = Tables.events(spark, sf)
    e.createOrReplaceTempView("__census_ev")
    val df = spark.sql(
      """SELECT event_id FROM __census_ev
        |WHERE value > (SELECT avg(value) FROM __census_ev)""".stripMargin)
    assert(census(df).getOrElse("events", 0) == 2,
      "outer scan + the scalar subquery's scan must both count")
  }

  test("tableOfPaths matches a partitioned/multi-file layout by path segment (round-9 ADVICE)") {
    import org.apache.hadoop.fs.Path
    def of(s: String) = ScanCensus.tableOfPaths(Seq(new Path(s)))
    // exact-leaf layout (the TESTDATA single-file shape)
    assert(of("/data/sf1/lineitem.parquet").contains("lineitem"))
    // directory layout: …/lineitem/… must still classify, including
    // per-partition subdirs below the table directory
    assert(of("/data/sf1/lineitem").contains("lineitem"))
    assert(of("/data/sf1/orders/o_orderdate=1995-01-01").contains("orders"))
    // partsupp-style substring must NOT false-positive onto `part`
    assert(of("/data/sf1/partsupplier").isEmpty)
  }

  test("scanFree recognizes checkpoint-leaf, local, and small-range frames — and nothing scanning a table") {
    import CacheOps.CheckpointSyntax
    val s = spark
    import s.implicits._
    assert(CacheOps.scanFree(Seq((1, "a")).toDF("k", "v")))
    assert(CacheOps.scanFree(spark.range(10).toDF()))
    val ck = Tables.events(spark, sf).select(col("event_id"))
      .truncatedCheckpoint()
    assert(CacheOps.scanFree(ck))
    assert(CacheOps.scanFree(ck.filter(col("event_id") > 0)
      .join(Seq(1L).toDF("event_id"), Seq("event_id"))))
    assert(!CacheOps.scanFree(Tables.events(spark, sf)))
    assert(!CacheOps.scanFree(
      ck.join(Tables.nation(spark, sf), col("event_id") === col("n_nationkey"))),
      "a real table leaf anywhere must defeat the scan-free proof")
  }
}
