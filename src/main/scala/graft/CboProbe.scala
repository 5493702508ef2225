package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import scala.util.control.NonFatal

/** CBO A/B for the six catalog SMJ flips (round-12, verdict item 5).
  *
  * Over the bucketed catalog layout, six queries flip small-side
  * joins broadcast→sort-merge because catalog tables fragment into
  * many files and size estimates inflate (SURVEY §9-r11). They were
  * left deliberately hint-free on the argument that SMJ is the
  * scale-correct strategy for their corpus-growing keys; this probe
  * VERIFIES that with data instead of argument: it writes the sf0.1
  * catalog, runs each query (a) as-is and (b) after
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS` with CBO on,
  * and records the join strategies + solo wall-clock of both legs.
  *
  * Done-criterion readout: for each query, does the stats-based
  * planner choice match the current plan (flip stays SMJ), revert it
  * to broadcast (stats correct the fragmented-size estimate), and
  * which leg is faster? Any flip that measurably LOSES with stats on
  * gets a justified hint (BASELINE.md round-12 carries the table).
  *
  * Usage: graft.CboProbe [sfDir] → one JSON line + CBOAB_r12.json.
  */
object CboProbe {

  private val flips = Seq("q_join_nearest", "q_mi_ranking",
    "q_kruskal_wallis", "q_rank_corr", "q_win_pctrank", "q_hist_eqfreq")

  private def strip(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def joinMix(p: SparkPlan): String = {
    var bhj = 0; var smj = 0; var shj = 0
    strip(p).foreach {
      case _: BroadcastHashJoinExec => bhj += 1
      case _: SortMergeJoinExec => smj += 1
      case _: ShuffledHashJoinExec => shj += 1
      case _ => ()
    }
    s"bhj=$bhj,smj=$smj,shj=$shj"
  }

  private def timeOne(spark: SparkSession, name: String,
      dir: String): (Double, String) = {
    val fn = SparkEntry.queries(name)
    try {
      val df = fn(spark, dir)
      val mix = joinMix(df.queryExecution.executedPlan)
      val t0 = System.nanoTime()
      graft.operators.CacheOps.scoped {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      ((System.nanoTime() - t0) / 1e9, mix)
    } catch {
      case NonFatal(ex) =>
        System.err.println(s"[cbo] $name failed: ${ex.getMessage}")
        (-1.0, "err")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CBO_OUT", "CBOAB_r12.json")
    val prefix = "cbo"
    val wh = java.nio.file.Files.createTempDirectory("graft-cbo-wh").toString
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse(
        "SPARK_GRAFT_CPUS",
        math.min(16, Runtime.getRuntime.availableProcessors()).toString)}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.Layout.writeGradedCatalog(spark, sfDir, prefix)
    val dir = s"catalog:$prefix"
    // warm pass (codegen/JIT) before either timed leg
    flips.foreach(n => timeOne(spark, n, dir))

    val before = flips.map(n => n -> timeOne(spark, n, dir)).toMap

    // the B leg: table+column stats + CBO — the cluster posture where
    // the planner sees row counts and NDVs instead of file sizes
    Tables.names.foreach { t =>
      spark.sql(s"ANALYZE TABLE ${prefix}_$t COMPUTE STATISTICS " +
        "FOR ALL COLUMNS")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    // stats change plan choice at ANALYSIS of each fresh query run —
    // the memoized Tables plans are per (session, dir) so reuse the
    // same session but force re-planning through fresh DataFrames
    // (queries build fresh plans per call already)
    val after = flips.map(n => n -> timeOne(spark, n, dir)).toMap

    def fmt(d: Double) = f"$d%.3f"
    val body = flips.map { n =>
      val (tb, mb) = before(n)
      val (ta, ma) = after(n)
      s""""$n":{"t_nostats":${fmt(tb)},"plan_nostats":"$mb","t_stats":${fmt(ta)},"plan_stats":"$ma"}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"cbo_ab","sf":"$sfDir","queries":$body}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    graft.plans.Layout.deleteTree(wh)
    spark.stop()
  }
}
