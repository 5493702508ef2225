package graft

import org.apache.spark.sql.functions._
import graft.queries.{IntervalQueries, EvalExtraQueries}

/** Invariants for the round-4 interval/gaps-and-islands family and
  * the evaluation-metric family (sf0.001). The oracle gate proves
  * cross-engine value equality; these prove the MATH is the intended
  * one (islands disjoint, metrics bounded, ranks correlation in
  * [−1, 1]) independent of the DuckDB mirror.
  */
class IntervalEvalSpec extends GraftSpecBase {

  test("interval islands are disjoint, ordered, and cover every event") {
    val rows = IntervalQueries.intervalMerge(spark, sf)
      .orderBy(col("user_id"), col("island")).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum == total,
      "every event lands in exactly one island")
    rows.groupBy(_.getLong(0)).foreach { case (_, isl) =>
      val sorted = isl.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getTimestamp(a.fieldIndex("island_end"))
          val bStart = b.getTimestamp(b.fieldIndex("island_start"))
          assert(bStart.after(aEnd),
            s"islands are separated by a strict gap ($aEnd vs $bStart)")
        case _ =>
      }
    }
    // every island spans at least one 30-min session
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("duration_sec")) >= 30 * 60)
    }
  }

  test("streaks: longest <= active days, runs partition the active days") {
    val rows = IntervalQueries.streak(spark, sf).collect()
    val activeDays = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts2"))).distinct().count()
    assert(rows.map(_.getLong(1)).sum == activeDays)
    rows.foreach { r =>
      val (act, nRuns, longest) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest <= act && longest >= 1)
      assert(nRuns >= 1 && nRuns <= act)
      // pigeonhole: longest run at least ceil(active/runs)
      assert(longest * nRuns >= act)
    }
  }

  test("concurrency peak is within [1, events-of-type] and the sweep balances") {
    val rows = IntervalQueries.concurrency(spark, sf).collect()
    val byType = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val (t, peak) = (r.getString(0), r.getLong(1))
      assert(peak >= 1 && peak <= byType(t))
    }
  }

  test("regression metrics: rmse >= mae >= 0 and r2 <= 1") {
    EvalExtraQueries.regrMetrics(spark, sf).collect().foreach { r =>
      val (rmse, mae, r2) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(mae >= 0 && rmse >= mae - 1e-9,
        "RMSE dominates MAE (power-mean inequality)")
      assert(r2 <= 1.0 + 1e-9)
    }
  }

  test("macro F1: class metrics bounded, macro equals the mean of f1") {
    val rows = EvalExtraQueries.macroF1(spark, sf).collect()
    val f1s = rows.map(_.getDouble(6))
    rows.foreach { r =>
      Seq(4, 5, 6).foreach { i =>
        assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0)
      }
    }
    val macro1 = rows.head.getDouble(7)
    assert(math.abs(macro1 - f1s.sum / f1s.length) < 1e-5)
  }

  test("spearman rho in [-1, 1]; jsd in [0, 1] bits; cramers v in [0, 1]") {
    EvalExtraQueries.rankCorr(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
    val j = EvalExtraQueries.jsd(spark, sf).collect().head
    val jb = j.getDouble(j.fieldIndex("jsd_bits"))
    assert(jb >= 0.0 && jb <= 1.0, "JSD with log2 is bounded by 1 bit")
    val v = EvalExtraQueries.cramersV(spark, sf).collect().head
    assert(v.getDouble(v.fieldIndex("v")) >= 0.0 &&
      v.getDouble(v.fieldIndex("v")) <= 1.0)
  }
}
