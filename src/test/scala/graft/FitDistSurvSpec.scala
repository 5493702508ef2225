package graft

import graft.queries.FitDistSurvQueries

/** Independent references for the final round-11-continuation batch:
  * Deming closed form, Gamma MoM, and an enumerated Aalen–Johansen
  * estimator (sf0.001; the sf0.01 oracle gate certifies hashes). */
class FitDistSurvSpec extends GraftSpecBase {

  private val tol = 1e-4

  test("q_deming_reg matches the closed form and dominates OLS under noise in x") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("CAST(size(split(text, ' ')) AS DOUBLE) AS x",
        "CAST(round(n_chars/5.0, 6) AS DOUBLE) AS y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val mx = rows.map(_._1).sum / n; val my = rows.map(_._2).sum / n
    val cxx = rows.map(t => t._1 * t._1).sum / n - mx * mx
    val cyy = rows.map(t => t._2 * t._2).sum / n - my * my
    val cxy = rows.map(t => t._1 * t._2).sum / n - mx * my
    val slope = (cyy - cxx +
      math.sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy)) / (2.0 * cxy)
    val out = FitDistSurvQueries.demingReg(spark, sf).collect().head
    assert(out.getLong(0) == rows.length.toLong)
    // the Deming sqrt amplifies the query's 8dp moment roundings —
    // compare at 1e-3, not the raw fold tolerance
    assert(math.abs(out.getDouble(1) - slope) < 1e-3)
    assert(math.abs(out.getDouble(2) - (my - slope * mx)) < 1e-3)
    assert(math.abs(out.getDouble(3) - cxy / cxx) < 1e-3)
    // errors-in-variables correction never shrinks the slope below
    // OLS when the covariance is positive
    assert(out.getDouble(1) >= out.getDouble(3) - tol)
  }

  test("q_gamma_fit matches method-of-moments estimates") {
    val ys = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("round(o_totalprice/100000.0, 8) AS y")
      .collect().map(_.getDouble(0))
    val n = ys.length.toDouble
    val mu = ys.sum / n
    val m2 = ys.map(y => y * y).sum / n - mu * mu
    val m3 = ys.map(y => y * y * y).sum / n -
      3.0 * mu * (ys.map(y => y * y).sum / n) + 2.0 * mu * mu * mu
    val skew = m3 / math.sqrt(m2 * m2 * m2)
    val out = FitDistSurvQueries.gammaFit(spark, sf).collect().head
    assert(out.getLong(0) == ys.length.toLong)
    assert(math.abs(out.getDouble(1) - mu) < tol)
    assert(math.abs(out.getDouble(2) - m2) < tol)
    assert(math.abs(out.getDouble(3) - mu * mu / m2) < 0.01)
    assert(math.abs(out.getDouble(4) - mu / m2) < 0.01)
    // the synthetic order values are near-symmetric (skew ~ -0.015),
    // so the skew-implied shape is huge and rounding-amplified —
    // compare RELATIVELY
    val wantSkewShape = 4.0 / (skew * skew)
    assert(math.abs(out.getDouble(5) - wantSkewShape) / wantSkewShape < 1e-4)
    assert(out.getDouble(3) > 0 && out.getDouble(4) > 0)
  }

  test("q_competing_risks matches an enumerated Aalen-Johansen estimator") {
    val last = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.expr(
        "max(struct(o_orderdate AS dt, o_orderkey AS k, o_orderstatus AS st)) AS m"))
      .selectExpr("datediff(to_date(m.dt), to_date('1990-01-01')) AS t",
        "m.st AS st")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val byDay = last.groupBy(_._1).toSeq.sortBy(_._1)
    var surv = 1.0
    var cif1 = 0.0
    var cif2 = 0.0
    val want = scala.collection.mutable.Map[Int, (Long, Long, Long, Double, Double)]()
    byDay.foreach { case (t, xs) =>
      val nR = last.count(_._1 >= t).toLong
      val d1 = xs.count(_._2 == "F").toLong
      val d2 = xs.count(_._2 == "P").toLong
      cif1 += surv * d1 / nR
      cif2 += surv * d2 / nR
      if (d1 + d2 > 0) want(t) = (nR, d1, d2, cif1, cif2)
      surv *= 1.0 - (d1 + d2).toDouble / nR
    }
    val out = FitDistSurvQueries.competingRisks(spark, sf).collect()
    assert(out.length == want.size)
    out.foreach { r =>
      val (nR, d1, d2, c1, c2) = want(r.getInt(0))
      assert(r.getLong(1) == nR && r.getLong(2) == d1 && r.getLong(3) == d2)
      assert(math.abs(r.getDouble(4) - c1) < 1e-3, s"t=${r.getInt(0)} cif_f")
      assert(math.abs(r.getDouble(5) - c2) < 1e-3)
    }
    // CIFs are monotone and their sum never exceeds 1
    val sorted = out.sortBy(_.getInt(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getDouble(4) >= a.getDouble(4) - 1e-9)
        assert(b.getDouble(5) >= a.getDouble(5) - 1e-9)
      case _ =>
    }
    val lastRow = sorted.last
    assert(lastRow.getDouble(4) + lastRow.getDouble(5) <= 1.0 + 1e-6)
  }
}
