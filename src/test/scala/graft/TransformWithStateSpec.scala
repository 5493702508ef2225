package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running statistics with the transformWithState API — the
  * Spark 4 successor of flatMapGroupsWithState (SURVEY §2-B's
  * stateful-sessionization row tests the older API; this suite
  * proves the new one on the same engine): typed ValueState per key,
  * RocksDB state store, update-mode emission per micro-batch.
  */
/** Running (count, max) per user — O(1) state per key. Top-level
  * class: a spec-nested one would capture the (non-serializable)
  * suite in its closure. */
private[graft] class TwsRunningStats
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
  @transient private var cnt: ValueState[Long] = _
  @transient private var mx: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    mx = getHandle.getValueState[Double]("mx", Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      tv: TimerValues): Iterator[(Long, Long, Double)] = {
    var c = if (cnt.exists()) cnt.get() else 0L
    var m = if (mx.exists()) mx.get() else Double.MinValue
    rows.foreach { r => c += 1; m = math.max(m, r._2) }
    cnt.update(c)
    mx.update(m)
    Iterator((key, c, m))
  }
}

class TransformWithStateSpec extends GraftSpecBase {
  import spark.implicits._

  test("transformWithState keeps per-key running state across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("tws").toString
    try {
      val mem = MemoryStream[(Long, Double)](spark)
      val out = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new TwsRunningStats, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n", "max_v")
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode("update").option("checkpointLocation", ckpt).start()
      try {
        mem.addData((1L, 10.0), (1L, 5.0), (2L, 7.0))
        q.processAllAvailable()
        mem.addData((1L, 20.0), (2L, 1.0))
        q.processAllAvailable()
        val rows = spark.table("tws_out")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // batch 1 emissions
        assert(rows.contains((1L, 2L, 10.0)), rows.mkString(", "))
        assert(rows.contains((2L, 1L, 7.0)))
        // batch 2: state carried over — counts continue, max updates
        assert(rows.contains((1L, 3L, 20.0)))
        assert(rows.contains((2L, 2L, 7.0)), "max survives a smaller value")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
