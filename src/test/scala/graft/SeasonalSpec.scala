package graft

import org.apache.spark.sql.functions._
import graft.queries.SeasonalQueries

/** Invariants for the round-4 seasonal/sequence family (sf0.001). */
class SeasonalSpec extends GraftSpecBase {

  test("order gaps: min <= median <= max, gaps only for repeat customers") {
    val rows = SeasonalQueries.orderGap(spark, sf).collect()
    rows.foreach { r =>
      val (mn, md, mx) = (r.getInt(2), r.getDouble(3), r.getInt(4))
      assert(mn <= md && md <= mx)
      assert(r.getLong(1) >= 1)
    }
    val repeat = Tables.orders(spark, sf).groupBy(col("o_custkey")).count()
      .where(col("count") >= 2).count()
    assert(rows.length == repeat, "one row per repeat customer")
  }

  test("weekday profile: shares sum to 1 per type, ranks are a permutation") {
    val rows = SeasonalQueries.weekdayProfile(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-4)
      assert(g.map(_.getInt(4)).sorted.toSeq == (1 to g.length))
    }
  }

  test("peaks strictly exceed both neighbors") {
    SeasonalQueries.peakDetect(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) > r.getLong(3) && r.getLong(2) > r.getLong(4))
    }
  }

  test("changepoint day is within the observed horizon and CUSUM >= 0") {
    val rows = SeasonalQueries.changepoint(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("user overlap: intersection bounded by set sizes, jaccard in [0,1]") {
    queries.OverlapSeriesQueries.userOverlap(spark, sf).collect().foreach { r =>
      val (n1, n2, ni) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ni <= math.min(n1, n2))
      val j = r.getDouble(5)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("rolling correlation is null before 7 days then within [-1, 1]") {
    val rows = queries.OverlapSeriesQueries.rollingCorr(spark, sf)
      .orderBy(col("day")).collect()
    assert(rows.take(6).forall(_.isNullAt(3)), "first 6 days have no full window")
    rows.drop(6).foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }

  test("cohort LTV is non-decreasing in age within each cohort") {
    val rows = queries.OverlapSeriesQueries.cohortLtv(spark, sf).collect()
    rows.groupBy(_.get(0)).foreach { case (_, g) =>
      val byAge = g.sortBy(_.getInt(1))
      byAge.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDouble(5) >= a.getDouble(5) - 1e-9,
            "cumulative value per user never decreases")
        case _ =>
      }
    }
  }

  test("RSI stays within [0, 100]") {
    queries.OverlapSeriesQueries.rsi(spark, sf).collect().foreach { r =>
      val v = r.getDouble(2)
      assert(v >= 0.0 && v <= 100.0)
    }
  }

  test("crossval folds partition the orders and are balanced-ish") {
    val rows = SeasonalQueries.crossval(spark, sf).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3, 4))
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "folds partition the table")
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == total)
      // md5 folds should be within a loose band of n/5
      assert(r.getLong(1) > total / 10 && r.getLong(1) < total * 3 / 10)
    }
  }
}
