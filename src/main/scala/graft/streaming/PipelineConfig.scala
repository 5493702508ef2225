package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Typed pipeline configuration (reference operator A12: the Go
  * Lambda read `CT_*` environment variables for stream name, region
  * and debug — SURVEY.md §2-A). One immutable read at startup; no
  * config lookups on the hot path. */
case class PipelineConfig(
    inPath: String,
    checkpoint: String,
    sinkName: String,
    maxFilesPerTrigger: Int,
    watermark: String,
    debug: Boolean,
    /** State-store provider class for the stateful operators
      * (dedup-within-watermark, sessionization). None = Spark's
      * default in-memory HDFS-backed store; the 100 TB posture is
      * RocksDB (state larger than executor heap spills to local SSD
      * instead of OOMing — round-11, verdict item 7). */
    stateStoreProvider: Option[String] = None) {

  /** Apply the session-level knobs this config owns (currently the
    * state-store provider). Call once before `writeStream.start()`. */
  def applyTo(spark: SparkSession): Unit =
    stateStoreProvider.foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
}

object PipelineConfig {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Environment surface mirroring the reference's `CT_*` family.
    * `GRAFT_CT_STATE_STORE=rocksdb` (or a full provider class name)
    * selects the state-store backend. */
  def fromEnv(env: Map[String, String] = sys.env): PipelineConfig =
    PipelineConfig(
      inPath = env.getOrElse("GRAFT_CT_IN_PATH", "/tmp/cloudtrail/landing"),
      checkpoint = env.getOrElse("GRAFT_CT_CHECKPOINT", "/tmp/cloudtrail/chk"),
      sinkName = env.getOrElse("GRAFT_CT_SINK", "default"),
      maxFilesPerTrigger =
        env.getOrElse("GRAFT_CT_MAX_FILES_PER_TRIGGER", "100").toInt,
      watermark = env.getOrElse("GRAFT_CT_WATERMARK", "10 minutes"),
      debug = env.getOrElse("GRAFT_CT_DEBUG", "false").toBoolean,
      stateStoreProvider = env.get("GRAFT_CT_STATE_STORE").map {
        case "rocksdb" => RocksDbProvider
        case other => other
      })
}

/** Structured progress logging (reference operator A11: mozlog-format
  * JSON summaries of files processed / record counts / errors —
  * SURVEY.md §2-A). Emits one JSON line per micro-batch with the
  * fields an operator dashboards at scale: rows in, processing rate,
  * batch duration, state rows. */
class JsonProgressListener(log: String => Unit = Console.err.println)
    extends StreamingQueryListener {

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    log(s"""{"type":"stream.start","id":"${e.id}","name":${q(e.name)}}""")

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    log(s"""{"type":"stream.progress","id":"${p.id}","batch":${p.batchId},""" +
      s""""rows":${p.numInputRows},"rowsPerSec":${safe(p.processedRowsPerSecond)},""" +
      s""""durationMs":${p.durationMs.getOrDefault("triggerExecution", -1L)},""" +
      s""""stateRows":$stateRows}""")
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    log(s"""{"type":"stream.stop","id":"${e.id}","error":${q(e.exception.orNull)}}""")

  private def safe(d: Double): String =
    if (d.isNaN || d.isInfinite) "0" else d.toString
  // Full JSON string escape incl. control chars: exception messages
  // and query names routinely carry newlines/tabs, which would emit
  // invalid JSON lines and break the structured-log consumer.
  private def q(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object JsonProgressListener {
  /** Attach a listener to the session; returns it for removal. */
  def attach(spark: SparkSession,
      log: String => Unit = Console.err.println): JsonProgressListener = {
    val l = new JsonProgressListener(log)
    spark.streams.addListener(l)
    l
  }
}
