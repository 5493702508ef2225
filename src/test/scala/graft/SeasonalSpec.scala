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
