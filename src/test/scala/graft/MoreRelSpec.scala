package graft

import org.apache.spark.sql.functions._
import graft.queries.MoreRelQueries

/** Semantics tests for the round-2 relational widening. */
class MoreRelSpec extends GraftSpecBase {

  test("q_gapfill grid is dense: hours x types, zero-filled") {
    val df = MoreRelQueries.gapfill(spark, sf).cache()
    val hours = df.select("h").distinct().count()
    val types = df.select("event_type").distinct().count()
    assert(df.count() === hours * types, "grid must be dense")
    // zero-filled cells exist only where no events landed
    val zeros = df.filter(col("n") === 0)
    assert(zeros.filter(col("sum_value") =!= 0.0).count() === 0)
    df.unpersist()
  }

  test("q_cte_recursive walks region->nation->customer completely") {
    val df = MoreRelQueries.cteRecursive(spark, sf).cache()
    val byDepthKind = df.groupBy("depth", "kind")
      .agg(sum("n").as("total")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byDepthKind((0, "region")) ===
      Tables.region(spark, sf).count())
    assert(byDepthKind((1, "nation")) ===
      Tables.nation(spark, sf).count())
    assert(byDepthKind((2, "customer")) ===
      Tables.customer(spark, sf).count())
    df.unpersist()
  }

  test("q_interpolate repairs nulls within neighbor bounds, passes values through") {
    val df = MoreRelQueries.interpolate(spark, sf).cache()
    // non-null readings are returned as-is (mod rounding)
    val bad = df.filter(col("good").isNotNull &&
      abs(col("repaired") - round(col("good"), 4)) > 1e-9)
    assert(bad.count() === 0)
    // repaired interior nulls lie within [min, max] of the series'
    // value range per user (linearity bound)
    val range = MoreRelQueries.interpolate(spark, sf)
      .filter(col("good").isNotNull)
      .groupBy("user_id")
      .agg(min("good").as("lo"), max("good").as("hi"))
    val out = df.filter(col("good").isNull && col("repaired").isNotNull)
      .join(range, "user_id")
      .filter(col("repaired") < col("lo") - 1e-9 ||
        col("repaired") > col("hi") + 1e-9)
    assert(out.count() === 0, "interpolation cannot overshoot the neighbors")
    df.unpersist()
  }

  test("q_win_ignore_nulls forward-fills error gaps") {
    val df = MoreRelQueries.winIgnoreNulls(spark, sf)
    // filled equals good_value on non-null rows
    assert(df.filter(col("good_value").isNotNull &&
      col("filled") =!= col("good_value")).count() === 0)
    // a filled null row must carry some earlier value (or null if no
    // prior good value exists for the user)
    val bad = df.filter(col("good_value").isNull && col("filled").isNull)
      .join(df.filter(col("good_value").isNotNull)
          .groupBy("user_id").agg(min("ts2").as("first_good")),
        Seq("user_id"))
      .filter(col("ts2") >= col("first_good"))
    assert(bad.count() === 0)
  }

  test("q_corr values are within [-1, 1]") {
    val vals = MoreRelQueries.corrQ(spark, sf)
      .select("corr_qty_price").collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("q_histogram buckets partition the table") {
    val df = MoreRelQueries.histogram(spark, sf)
    val total = df.agg(sum("n")).collect()(0).getLong(0)
    assert(total === Tables.orders(spark, sf).count())
    // bucket boundaries respected
    val off = df.filter(col("lo") < col("bucket") * 50000 ||
      col("hi") >= (col("bucket") + 1) * 50000)
    assert(off.count() === 0)
  }
}
