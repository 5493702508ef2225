package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: for each named query (default: all), execute
  * at the given sf dir and print the exchange/join/scan skeleton of
  * the FINAL (AQE-resolved) physical plan. This is the iteration loop
  * the scale review runs on: count the shuffles, check the join
  * strategies, confirm pushdown.
  *
  * Usage: graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    // SPARK_GRAFT_LAYOUT=<prefix>: run the census over the production
    // catalog Layout instead of raw parquet (mirrors Verify's dial —
    // round-11, verdict item 1: the catalog plans must show the same
    // scan-census distribution as the parquet plans)
    val layoutPrefix = sys.env.get("SPARK_GRAFT_LAYOUT").filter(_.nonEmpty)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match the bench's default configuration unless overridden, so
      // the exchange census reflects what the bench actually executes
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // run-private warehouse, deleted on exit below (round-11 review:
    // the materialized fixture catalog is data-proportional — leaking
    // one copy per census run is the leak class round-10 closed for
    // Verify's checkpoint dirs)
    val ownWarehouse: Option[String] = layoutPrefix.map(_ =>
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    ownWarehouse.foreach(builder.config("spark.sql.warehouse.dir", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queryDir = layoutPrefix match {
      case Some(p) =>
        // bucket count ~ session cores here: Verify/Explain run ONE
        // query at a time, so per-query scan parallelism should fill
        // the machine (the BENCH divides cores by its stream count
        // instead — see Bench.scala: bucket count divides the
        // concurrency budget). SPARK_GRAFT_LAYOUT_BUCKETS overrides.
        val layoutBuckets = sys.env.getOrElse(
          "SPARK_GRAFT_LAYOUT_BUCKETS", cpus.toString).toInt
        graft.plans.Layout.writeGradedCatalog(spark, sfDir, p,
          buckets = layoutBuckets)
        s"catalog:$p"
      case None => sfDir
    }
    val interesting = Seq("Exchange", "Join", "Broadcast", "HashAggregate",
      "WindowGroupLimit", "TakeOrderedAndProject", "PushedFilters", "Window")
    // whole-surface census accumulators (round-10: the per-round
    // distribution previously needed ad-hoc log post-processing)
    val distribution = scala.collection.mutable.Map[Int, Int]()
    var totalFactScans = 0
    var totalUnknown = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, queryDir)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          // shuffle census: count Exchange OPERATORS (the old
          // trim-startsWith form matched nothing — plan lines carry
          // "+- " prefixes), split into real shuffles vs reused
          val lines = p.linesIterator.toSeq
          val nEx = lines.count(l => (l.contains("Exchange hashpartitioning")
            || l.contains("Exchange rangepartitioning")
            || l.contains("Exchange SinglePartition"))
            && !l.contains("ReusedExchange"))
          val nRe = lines.count(_.contains("ReusedExchange"))
          // scan census: how many times each base table is read in
          // this plan (repeated fact scans are a 100 TB I/O
          // multiplier — the round-7 q_mi_ranking/uStats/
          // q_dq_scorecard class). Round 8: counted on the OPTIMIZED
          // LOGICAL plans expanded through the CheckpointRegistry, so
          // the census sees checkpointed interiors (the round-7 blind
          // spot), and matched by the relation's actual rootPaths
          // instead of plan-string substrings (which Spark truncates
          // for long Locations — the silent-undercount failure mode).
          // Leaves matching no table print as unknown=N. The same
          // census logic gates the build in GlobalScanSpec.
          val scans = graft.plans.ScanCensus
            .tableScanCounts(graft.plans.CheckpointRegistry
              .expand(df.queryExecution.optimizedPlan))
          val scanStr = (scans - "unknown").toSeq.sortBy(-_._2)
            .map { case (t, c) => s"$t=$c" }
            .++(scans.get("unknown").filter(_ > 0).map(n => s"unknown=$n"))
            .mkString(",")
          val factCounts = scans.collect {
            case (t, c) if graft.plans.ScanCensus.factTables.contains(t) => c
          }
          val factMax = factCounts.maxOption.getOrElse(0)
          distribution(factMax) = distribution.getOrElse(factMax, 0) + 1
          totalFactScans += factCounts.sum
          totalUnknown += scans.getOrElse("unknown", 0)
          println(s"===== $name  (exchanges: $nEx, reused: $nRe, scans: $scanStr)")
          p.linesIterator
            .filter(l => interesting.exists(l.contains))
            .foreach(l => println("  " + l.trim.take(150)))
        } catch { case e: Throwable =>
          // single-line, untruncated-enough message: an analysis error
          // class (multi-line message starting with \n) previously
          // printed as an empty FAILED line, hiding the cause
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .replace('\n', ' ').take(500)
          println(s"===== $name FAILED: $msg")
        }
      }
    // the SURVEY §9 census line, computed instead of post-processed
    println("===== CENSUS max-per-fact distribution: " +
      distribution.toSeq.sorted.map { case (k, n) => s"${k}x$n" }
        .mkString(" / ") +
      s"; total fact-scan occurrences $totalFactScans; unknown $totalUnknown")
    try spark.stop()
    finally ownWarehouse.foreach(graft.plans.Layout.deleteTree)
  }
}
