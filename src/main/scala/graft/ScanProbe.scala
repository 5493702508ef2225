package graft
import org.apache.spark.sql.SparkSession
/** Dev probe for the round-8 scan gate: per-query fact-table scan
  * counts over CheckpointRegistry-expanded logical plans. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        val plans = graft.plans.CheckpointRegistry.expand(df.queryExecution.optimizedPlan)
        val counts = graft.plans.ScanCensus.tableScanCounts(plans)
        val facts = counts.filter { case (t, _) => graft.plans.ScanCensus.factTables.contains(t) }
        val mx = if (facts.isEmpty) 0 else facts.values.max
        val unk = counts.getOrElse("unknown", 0)
        println(f"SCAN $mx%3d $name ${facts.toSeq.sortBy(-_._2).map{case(t,c)=>s"$t=$c"}.mkString(",")}${if (unk>0) s" unknown=$unk" else ""}")
      } catch { case e: Throwable => println(s"SCAN ERR $name ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
