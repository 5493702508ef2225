package graft

import org.apache.spark.sql.functions._
import graft.queries.RobustStatsQueries

/** Semantic invariants of the band-pass / winsorize / session-stats
  * operators at sf0.001.
  */
class RobustStatsSpec extends GraftSpecBase {

  test("vocab bandpass: kept ≤ original counts; vocab ≤ 31") {
    val df = RobustStatsQueries.vocabBandpass(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count(),
      "every document profiled (right join)")
    assert(df.filter(col("kept_vocab") > 31).count() == 0)
    assert(df.filter(col("kept_toks") < col("kept_vocab")).count() == 0,
      "occurrences ≥ distinct")
  }

  test("winsorize: p05 ≤ p95; winsorized mean between the bounds") {
    val rows = RobustStatsQueries.winsorize(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (p05, p95) = (r.getDouble(2), r.getDouble(3))
      assert(p05 <= p95)
      val mw = r.getDouble(5)
      assert(mw >= p05 - 1e-9 && mw <= p95 + 1e-9,
        "clipped mean lies within the clip bounds")
    }
  }

  test("session stats: sessions ≥ 1, mean events ≥ 1, durations ≥ 0") {
    val rows = RobustStatsQueries.sessionStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(2) >= 1.0)
      assert(r.getDouble(3) >= 0.0)
    }
    // total events conserved: Σ (sessions × mean_events) == user events
    val total = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val n = Tables.events(spark, sf).count()
    assert(math.abs(total - n) < n * 0.001,
      s"session event totals $total reassemble the table $n")
  }
}
