package graft
import org.apache.spark.sql.SparkSession
/** Physical-vs-logical scan comparison for gate calibration. */
object ScanProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val phys = p.linesIterator.count(_.contains("FileScan parquet"))
      val reused = p.linesIterator.count(_.contains("ReusedExchange"))
      val plans = graft.plans.CheckpointRegistry.expand(df.queryExecution.optimizedPlan)
      val lg = graft.plans.ScanCensus.tableScanCounts(plans)
      println(s"CMP $name physTop=$phys reused=$reused logicalExpanded=${lg.toSeq.sortBy(-_._2).mkString(",")} nInteriors=${plans.size-1}")
    }
    spark.stop()
  }
}
