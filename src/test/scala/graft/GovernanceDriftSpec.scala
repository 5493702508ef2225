package graft

import org.apache.spark.sql.functions._
import graft.queries.{DriftQueries, GovernanceQueries}

/** Semantic invariants of the round-3 governance and monitoring
  * operators, checked at sf0.001.
  */
class GovernanceDriftSpec extends GraftSpecBase {

  test("scd2: versions are 1..n per user, exactly one current row") {
    val df = GovernanceQueries.scd2(spark, sf)
    val perUser = df.groupBy("user_id").agg(
      count(lit(1)).as("n"), max("version").as("maxv"),
      sum(col("is_current").cast("int")).as("n_cur"))
    assert(perUser.filter(col("n") =!= col("maxv")).count() == 0,
      "versions are dense 1..n")
    assert(perUser.filter(col("n_cur") =!= 1).count() == 0,
      "exactly one open interval per user")
    // intervals do not overlap: valid_to of v equals valid_from of v+1
    // is not required (gaps collapse), but valid_to must be > valid_from
    assert(df.filter(col("valid_to").isNotNull &&
      col("valid_to") < col("valid_from")).count() == 0)
    // consecutive versions never repeat the event_type
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("version"))
    assert(df.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev") === col("event_type")).count() == 0)
  }

  test("distinct_on: one row per customer, the latest order") {
    val df = GovernanceQueries.distinctOn(spark, sf)
    assert(df.count() == df.select("o_custkey").distinct().count())
    val maxDates = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(max("o_orderdate").as("md"))
    val j = df.join(maxDates, "o_custkey")
      .filter(col("o_orderdate") =!= col("md"))
    assert(j.count() == 0, "picked row carries the max date")
  }

  test("fd audit: orders/events keys unique, lineitem composite is not") {
    val rows = GovernanceQueries.fdViolations(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("orders(o_orderkey)").getLong(2) == 0)
    assert(rows("events(event_id)").getLong(2) == 0)
    assert(rows("lineitem(l_orderkey,l_linenumber)").getLong(2) > 0,
      "the synthetic lineitem's composite key is known-non-unique")
    rows.values.foreach { r =>
      assert(r.getLong(4) >= r.getLong(2), "excess rows ≥ dup keys")
    }
  }

  test("referential integrity: star FKs hold; docs→embeddings may not") {
    val rows = GovernanceQueries.referentialCheck(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("lineitem.l_orderkey->orders")._2 == 0)
    assert(rows("orders.o_custkey->customer")._2 == 0)
    assert(rows("customer.c_nationkey->nation")._2 == 0)
    assert(rows("embeddings.vec_id->documents")._2 == 0)
    rows.values.foreach { case (nChild, nOrphan) =>
      assert(nOrphan <= nChild)
    }
  }

  test("calibration: bins partition events; rates in [0,1]") {
    val rows = DriftQueries.calibration(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("gains: 10 deciles, cumulative gain ends at 1, lift decreasing-ish") {
    val rows = DriftQueries.gains(spark, sf).collect()
    assert(rows.length == 10)
    val gains = rows.map(_.getDouble(3))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b + 1e-9 },
      "cumulative gain is nondecreasing")
    assert(math.abs(gains.last - 1.0) < 1e-9)
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9,
      "full-population lift is exactly 1")
  }

  test("psi: nonnegative terms sum to the statistic") {
    val rows = DriftQueries.psi(spark, sf).collect()
    val psi = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == psi))
    assert(psi >= 0.0, "PSI is a nonnegative divergence")
    val termSum = rows.filter(!_.isNullAt(5)).map(_.getDouble(5)).sum
    assert(math.abs(termSum - psi) < 0.01)
  }

  test("feature hash: buckets within 0..63, weights cover all tokens") {
    val rows = DriftQueries.featureHash(spark, sf).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Number](0).longValue(); b >= 0 && b < 64 })
    val totTok = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " "))).count()
    assert(rows.map(_.getLong(2)).sum == totTok)
  }
}
