package graft

import graft.queries.SurvivalCoxQueries

/** Independent plain-Scala reference for the Cox score test: risk
  * sets enumerated directly (R_t = units with T >= t), Breslow ties
  * implicit in sharing the risk set. */
class SurvivalCoxSpec extends GraftSpecBase {

  test("q_cox_score matches the enumerated risk-set reference") {
    val units = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(
        org.apache.spark.sql.functions.expr(
          "datediff(to_date(max(o_orderdate)), to_date('1990-01-01')) AS t"),
        org.apache.spark.sql.functions.expr(
          "max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev"))
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        org.apache.spark.sql.functions.expr("c_custkey = o_custkey"))
      .selectExpr("t", "ev", "round(c_acctbal/10000.0, 8) AS x")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    var u = 0.0; var info = 0.0; var nEv = 0
    units.filter(_._2 == 1).foreach { case (t, _, x) =>
      val risk = units.filter(_._1 >= t)
      val xbar = risk.map(_._3).sum / risk.length
      val x2bar = risk.map(v => v._3 * v._3).sum / risk.length
      u += x - xbar
      info += x2bar - xbar * xbar
      nEv += 1
    }
    val out = SurvivalCoxQueries.coxScore(spark, sf).collect().head
    assert(out.getLong(0) == units.length.toLong)
    assert(out.getLong(1) == nEv.toLong)
    assert(math.abs(out.getDouble(2) - u) < 1e-3, s"U ${out.getDouble(2)} vs $u")
    assert(math.abs(out.getDouble(3) - info) < 1e-3)
    assert(math.abs(out.getDouble(4) - u / math.sqrt(info)) < 1e-4)
    assert(math.abs(out.getDouble(5) - u / info) < 1e-4)
    // the information of a real covariate over non-degenerate risk
    // sets is strictly positive
    assert(out.getDouble(3) > 0.0)
  }
}
