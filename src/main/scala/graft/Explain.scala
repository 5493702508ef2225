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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match the bench's default configuration unless overridden, so
      // the exchange census reflects what the bench actually executes
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("Exchange", "Join", "Broadcast", "HashAggregate",
      "WindowGroupLimit", "TakeOrderedAndProject", "PushedFilters", "Window")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
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
          // q_dq_scorecard class). Checkpoint interiors are not
          // visible here; the gate suites sweep those.
          val scans = lines.filter(_.contains("FileScan parquet"))
            .flatMap(l => Tables.names.find(t => l.contains(s"$t.parquet")))
            .groupBy(identity).view.mapValues(_.size)
            .toSeq.sortBy(-_._2)
          val scanStr = scans.map { case (t, c) => s"$t=$c" }.mkString(",")
          println(s"===== $name  (exchanges: $nEx, reused: $nRe, scans: $scanStr)")
          p.linesIterator
            .filter(l => interesting.exists(l.contains))
            .foreach(l => println("  " + l.trim.take(150)))
        } catch { case e: Throwable =>
          println(s"===== $name FAILED: ${e.getMessage.take(200)}")
        }
      }
    spark.stop()
  }
}
