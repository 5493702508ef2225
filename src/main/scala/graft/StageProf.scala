package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Round-12 profiling aid: runs each named query warm (bench-identical
  * session conf + persisted tables) and prints a per-stage breakdown of
  * the LAST (timed) run — stage wall-clock, summed task time, executor
  * CPU, shuffle bytes and the first line of the stage's name — plus
  * the per-query job count. This is the guide-§7.1 "which stage is
  * slow" loop for a headless container (no UI).
  *
  * Usage: graft.StageProf [sfDir] [query ...]
  */
object StageProf {
  private case class St(name: String, wallMs: Long, taskMs: Long,
    cpuMs: Long, shRead: Long, shWrite: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.table(spark, sfDir, n)
        df.persist().count()
      } catch { case scala.util.control.NonFatal(_) => }
    }
    val stages = TrieMap[Int, St]()
    val subm = TrieMap[Int, Long]()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        subm.put(e.stageInfo.stageId, System.nanoTime())
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = subm.get(si.stageId)
          .map(t0 => (System.nanoTime() - t0) / 1000000L).getOrElse(-1L)
        val m = si.taskMetrics
        stages.put(si.stageId, St(si.name.linesIterator.next(), wall,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, si.numTasks))
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm run (codegen + JIT), untimed
      graft.operators.CacheOps.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      stages.clear(); subm.clear(); jobs = 0
      val t0 = System.nanoTime()
      graft.operators.CacheOps.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener bus so all stage-completed events are counted
      // (bus API is private[spark] — reflection, as in Bench)
      try {
        val bus = spark.sparkContext.getClass
          .getMethod("listenerBus").invoke(spark.sparkContext)
        bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount <= 1)
          .foreach { m =>
            if (m.getParameterCount == 0) m.invoke(bus)
            else m.invoke(bus, java.lang.Long.valueOf(10000L))
          }
      } catch { case scala.util.control.NonFatal(_) => }
      val sts = stages.toSeq.sortBy(_._1)
      val totTask = sts.map(_._2.taskMs).sum
      println(f"==== $name wall=$wall%.2f s jobs=$jobs stages=${sts.size} " +
        f"taskSum=${totTask / 1000.0}%.2f s")
      sts.sortBy(-_._2.taskMs).take(12).foreach { case (id, s) =>
        println(f"  stage $id%4d task=${s.taskMs / 1000.0}%7.3f s " +
          f"cpu=${s.cpuMs / 1000.0}%7.3f wall=${s.wallMs / 1000.0}%6.2f " +
          f"tasks=${s.tasks}%3d shR=${s.shRead / 1024}%8dK " +
          f"shW=${s.shWrite / 1024}%8dK  ${s.name.take(70)}")
      }
    }
    spark.stop()
  }
}
