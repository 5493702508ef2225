package graft

import org.apache.spark.sql.functions._
import graft.queries.CalendarPathQueries

/** Semantic invariants of the calendar/path operators at sf0.001. */
class CalendarPathSpec extends GraftSpecBase {

  test("forward frame: 0 ≤ nxt_n ≤ 3; last event per user has 0") {
    val df = CalendarPathQueries.winForward(spark, sf)
    assert(df.filter(col("nxt_n") < 0 || col("nxt_n") > 3).count() == 0)
    val lasts = df.groupBy("user_id").agg(max("event_id").as("last_id"))
    // the time-ordered last event is not necessarily max(event_id);
    // instead assert per-user exactly one row with nxt_n = 0 … unless
    // a user has < 2 events (then more rows qualify is impossible:
    // frames past the end are always empty exactly once per user)
    val zeroCnt = df.filter(col("nxt_n") === 0).groupBy("user_id").count()
    assert(zeroCnt.filter(col("count") =!= 1).count() == 0,
      "exactly one empty forward frame per user")
  }

  test("date parts: qtr/week/doy ranges; week_start ≤ d ≤ month_end") {
    val rows = CalendarPathQueries.dateParts(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 4)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 53)
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 366)
      assert(!r.getDate(5).after(r.getDate(1)), "week start ≤ date")
      assert(!r.getDate(6).before(r.getDate(1)), "month end ≥ date")
      assert(r.getInt(7) >= 0 && r.getInt(7) <= 30)
    }
  }

  test("aging buckets cover all orders; totals positive") {
    val rows = CalendarPathQueries.ageBuckets(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.orders(spark, sf).count())
    assert(rows.forall(_.getDouble(3) > 0.0))
  }

  test("user paths: top-10 trigrams over the 5-type alphabet") {
    val rows = CalendarPathQueries.userPath(spark, sf).collect()
    assert(rows.length == 10)
    val types = Set("click", "purchase", "error", "signup", "view")
    rows.foreach { r =>
      val parts = r.getString(0).split(">")
      assert(parts.length == 3 && parts.forall(types))
      assert(r.getLong(1) >= 1)
    }
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }
}
