package graft

import graft.queries.SesEsdQueries

/** Independent references for the SES grid fit and the unrolled
  * generalized-ESD rounds (sf0.001; the sf0.01 oracle gate certifies
  * exact cross-engine hashes). */
class SesEsdSpec extends GraftSpecBase {

  private def r(x: Double, dp: Int) =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_ses_fit matches a plain-Scala truncated-SES reference") {
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("CAST(o_orderdate AS DATE) AS day",
        "CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS p")
      .groupBy("day")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(sum(p) AS DOUBLE)/100000.0 AS y"))
      .collect().map(row => (row.getDate(0).toLocalDate, row.getDouble(1)))
      .toMap
    val out = SesEsdQueries.sesFit(spark, sf).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.2, 0.5, 0.8))
    out.foreach { row =>
      val a = row.getDouble(0)
      val ws = (1 to 8).map(j => r(a * math.pow(1.0 - a, j - 1.0), 8))
      val es = daily.keys.toSeq.flatMap { t =>
        val lags = (1 to 8).map(j => daily.get(t.minusDays(j)))
        if (lags.exists(_.isEmpty)) None
        else Some(lags.flatten.zip(ws).map { case (y, w) => w * y }.sum
          - daily(t))
      }
      assert(row.getLong(1) == es.length.toLong, s"alpha=$a n_days")
      val sse = es.map(e => e * e).sum
      assert(math.abs(row.getDouble(2) - sse) / sse < 1e-6,
        s"alpha=$a sse ${row.getDouble(2)} vs $sse")
      assert(math.abs(row.getDouble(3)
        - math.sqrt(row.getDouble(2) / row.getLong(1))) < 1e-4)
    }
    // more smoothing (smaller alpha) averages more history; on this
    // noisy revenue series the heavier-weighted recent lag cannot be
    // better by an order of magnitude — sanity-bound the spread
    val sses = out.map(_.getDouble(2))
    assert(sses.max / sses.min < 10.0)
  }

  test("q_esd_outliers removes and retests the argmax deviation three times") {
    val all = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "round(value, 6) AS v")
      .collect().map(row => (row.getLong(0), row.getDouble(1)))
    var pool = all.toVector
    val expected = (1 to 3).map { _ =>
      val n = pool.length
      val mean = r(pool.map(_._2).sum / n, 8)
      val sd = r(math.sqrt((pool.map(t => t._2 * t._2).sum - n * mean * mean)
        / (n - 1)), 8)
      val cand = pool.map { case (id, v) =>
        (id, v, r(math.abs(v - mean) / sd, 8)) }
        .minBy(t => (-t._3, t._1))
      pool = pool.filterNot(_._1 == cand._1)
      cand
    }
    val out = SesEsdQueries.esdOutliers(spark, sf).collect()
    assert(out.length == 3)
    out.zip(expected).zipWithIndex.foreach { case ((row, (id, v, rs)), i) =>
      assert(row.getInt(0) == i + 1)
      assert(row.getLong(1) == id, s"round ${i + 1} candidate")
      assert(math.abs(row.getDouble(2) - v) < 1e-9)
      assert(math.abs(row.getDouble(3) - rs) < 1e-6)
      assert(row.getInt(4) == (if (rs > 3.0) 1 else 0))
    }
    // removed ids are distinct by construction
    assert(out.map(_.getLong(1)).distinct.length == 3)
  }
}
