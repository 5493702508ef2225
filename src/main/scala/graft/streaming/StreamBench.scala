package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.atomic.AtomicLong
import scala.util.control.NonFatal

/** Streaming throughput benchmark (round-12, verdict item 3): the
  * reference is a streaming pipeline, yet every recorded perf
  * artifact so far is batch — this main drives
  * [[CloudTrailPipeline.run]] end-to-end (gzip JSON file source →
  * envelope decode → fan-out → watermarked dedup → batched sink with
  * the ≤500/partial-retry wire loop) under the 100 TB state posture
  * (RocksDB provider) and records records/sec, the batch-duration
  * distribution, and state-store size as a BENCH-style JSON line.
  *
  * Volume: sized to the graded batch scale (sf0.1 events = 100k
  * rows) by default — `SPARK_GRAFT_STREAM_FILES` ×
  * `SPARK_GRAFT_STREAM_ENVS` envelopes/file ×
  * `SPARK_GRAFT_STREAM_RECS` records/envelope (defaults 100×20×100 =
  * 200k records, ~90 MB of JSON before gzip). Fixtures are
  * deterministic (seeded ids, the FIXTURES.md §B envelope shape) and
  * cached under a marker like the scaling blow-ups.
  *
  * Reading the number: the reference lives under the Kinesis
  * per-shard ingest quota — 1 MiB/s or 1000 records/s per shard
  * `[aws-public]` — so records/sec ÷ 1000 and payload MB/s ÷ 1 are
  * the "equivalent fully-utilized shards" this single-JVM pipeline
  * saturates; BASELINE.md's streaming section carries the
  * translation.
  *
  * Usage: graft.StreamBench; env dials:
  *   SPARK_GRAFT_STREAM_FILES/ENVS/RECS  fixture volume
  *   SPARK_GRAFT_STREAM_MAXFILES         maxFilesPerTrigger (20)
  *   SPARK_GRAFT_STREAM_WORK             fixture dir (/tmp/graft_stream)
  *   SPARK_GRAFT_STREAM_OUT              JSON path (STREAMBENCH_r12.json)
  *   SPARK_GRAFT_STREAM_ROCKSDB         RocksDB provider (true)
  */
object StreamBench {

  /** Counting sink: the wire loop runs for real (batching, retry
    * bookkeeping) against an in-JVM drain — the Kinesis connector
    * boundary is environment-blocked offline (SURVEY.md §8.4). */
  object CountingSink extends CloudTrailPipeline.RecordSink {
    val records = new AtomicLong(0L)
    val bytes = new AtomicLong(0L)
    override def put(batch: Seq[(String, String)]): Seq[Int] = {
      records.addAndGet(batch.size.toLong)
      bytes.addAndGet(batch.map(r => r._1.length + r._2.length).sum.toLong)
      Nil
    }
  }

  private def envelope(fileNo: Int, envNo: Int, recs: Int): String = {
    val records = (0 until recs).map { r =>
      val id = f"$fileNo%05d-$envNo%04d-$r%04d"
      // Event times MONOTONE in file order (round-12 measurement fix,
      // declared in OPTIMIZATION_r12.md): the original fixture cycled
      // the day with fileNo % 14, so every file past #13 replayed
      // already-watermarked days and the dedup dropped ~60% of the
      // volume as LATE (80,074 of 200,000 reached the sink) — the
      // recorded records/sec partly measured the drop path, not the
      // pipeline. One hour per file, intra-file jitter within the
      // hour: the watermark still advances and evicts state every
      // trigger (the eviction path stays exercised), but nothing is
      // late across triggers and the sink sees the full volume.
      val hour = fileNo // files are picked up in name order
      val day = 14 + hour / 24
      val hh = hour % 24
      val jitter = (envNo * 131 + r) % 3600
      val eventTime = f"2023-11-$day%02dT$hh%02d:${jitter / 60}%02d:${jitter % 60}%02dZ"
      s"""{"eventVersion":"1.08","eventTime":"$eventTime","eventSource":"s3.amazonaws.com","eventName":"GetObject","awsRegion":"us-east-1","sourceIPAddress":"10.0.${fileNo % 256}.${r % 256}","userAgent":"aws-cli/2.0","userIdentity":{"type":"IAMUser","principalId":"P$id","arn":"arn:aws:iam::123456789012:user/u${r % 50}","accountId":"123456789012","accessKeyId":"AKIA$id"},"requestParameters":"{\\"bucketName\\":\\"b${fileNo % 10}\\"}","responseElements":null,"requestID":"R$id","eventID":"E$id","eventType":"AwsApiCall","recipientAccountId":"123456789012","readOnly":true,"errorCode":null,"errorMessage":null}"""
    }
    s"""{"Records":[${records.mkString(",")}]}"""
  }

  private def writeFixtures(dir: String, files: Int, envs: Int,
      recs: Int): Unit = {
    val marker = java.nio.file.Paths.get(dir,
      s"_GRAFT_STREAM_OK_${files}_${envs}_$recs")
    if (java.nio.file.Files.exists(marker)) return
    val d = new java.io.File(dir)
    if (d.exists()) {
      d.listFiles().foreach(_.delete()); ()
    }
    java.nio.file.Files.createDirectories(d.toPath)
    (0 until files).foreach { f =>
      val os = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(d, f"ct-$f%05d.json.gz")))
      try {
        (0 until envs).foreach { e =>
          os.write(envelope(f, e, recs).getBytes("UTF-8"))
          os.write('\n')
        }
      } finally os.close()
    }
    java.nio.file.Files.createFile(marker)
    ()
  }

  private def pct(sorted: Seq[Double], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))

  private def fmt(d: Double): String = f"$d%.3f"

  def main(args: Array[String]): Unit = {
    val files = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "100").toInt
    val envs = sys.env.getOrElse("SPARK_GRAFT_STREAM_ENVS", "20").toInt
    val recs = sys.env.getOrElse("SPARK_GRAFT_STREAM_RECS", "100").toInt
    val maxFiles =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_MAXFILES", "20").toInt
    val work = sys.env.getOrElse("SPARK_GRAFT_STREAM_WORK", "/tmp/graft_stream")
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "STREAMBENCH_r12.json")
    val rocks =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROCKSDB", "true").toBoolean

    writeFixtures(s"$work/in", files, envs, recs)
    val chk = java.nio.file.Files
      .createTempDirectory("graft_stream_chk").toString

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS",
        math.min(16, Runtime.getRuntime.availableProcessors()).toString)}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // progress capture: per-batch input rows, trigger durations, and
    // the dedup operator's state size — the artifact's distribution
    // comes from the engine's own progress events, not wall-clock
    // guesswork
    case class Batch(rows: Long, durMs: Long, stateRows: Long,
        stateBytes: Long)
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Batch]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val (sr, sb) = p.stateOperators.headOption
          .map(s => (s.numRowsTotal, s.memoryUsedBytes))
          .getOrElse((0L, 0L))
        batches.add(Batch(p.numInputRows,
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L), sr, sb))
        ()
      }
    }
    spark.streams.addListener(listener)

    CountingSink.records.set(0L)
    CountingSink.bytes.set(0L)
    val cfg = PipelineConfig.fromEnv(Map(
      "GRAFT_CT_IN_PATH" -> s"$work/in",
      "GRAFT_CT_CHECKPOINT" -> chk,
      "GRAFT_CT_MAX_FILES_PER_TRIGGER" -> maxFiles.toString) ++
      (if (rocks) Map("GRAFT_CT_STATE_STORE" -> "rocksdb") else Map.empty))
    val t0 = System.nanoTime()
    val q = CloudTrailPipeline.run(spark, cfg, CountingSink)
    try q.processAllAvailable() finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)

    val expected = files.toLong * envs * recs
    val got = CountingSink.records.get()
    val mb = CountingSink.bytes.get() / 1e6
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq.filter(_.rows > 0)
    val durs = bs.map(_.durMs.toDouble / 1000.0).sorted
    val recsPerSec = if (wallSec > 0) got / wallSec else 0.0
    val mbPerSec = if (wallSec > 0) mb / wallSec else 0.0
    val stateRowsMax = (0L +: bs.map(_.stateRows)).max
    val stateBytesMax = (0L +: bs.map(_.stateBytes)).max
    val provider = try {
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        .map(p => if (p.contains("RocksDB")) "rocksdb" else "hdfs")
        .getOrElse("hdfs")
    } catch { case NonFatal(_) => "hdfs" }
    // equivalent fully-utilized Kinesis shards: the quota is 1000
    // records/s AND 1 MiB/s per shard — a deployment needs the max of
    // the two dimensions' shard counts
    val shards = math.max(recsPerSec / 1000.0, mbPerSec / 1.048576)
    val json = s"""{"metric":"stream","value":${fmt(recsPerSec)},"unit":"records/sec","records":$got,"expected":$expected,"wall_sec":${fmt(wallSec)},"mb":${fmt(mb)},"mb_per_sec":${fmt(mbPerSec)},"kinesis_shard_equiv":${fmt(shards)},"batches":${bs.size},"batch_p50":${fmt(pct(durs, 0.5))},"batch_p95":${fmt(pct(durs, 0.95))},"batch_max":${fmt(if (durs.isEmpty) 0.0 else durs.max)},"state_rows_max":$stateRowsMax,"state_mb_max":${fmt(stateBytesMax / 1e6)},"provider":"$provider","max_files_per_trigger":$maxFiles,"files":$files}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    graft.plans.Layout.deleteTree(chk)
    spark.stop()
  }
}
