package graft

import graft.queries.FitExtraQueries

/** Independent-reference checks for the round-11 fit shelf: each
  * query's closed-form/argmin result is recomputed in plain Scala
  * from the same sf0.001 rows (no Spark aggregation in the reference
  * path) and compared within float tolerance — the oracle gate then
  * certifies exact cross-engine hashes at sf0.01. */
class FitExtraSpec extends GraftSpecBase {

  private val tol = 1e-4

  test("q_quantile_reg returns the true pinball argmin per tau") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("round(l_extendedprice/1000.0, 6) AS y", "l_quantity AS x")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def pinball(tau: Double, b0: Double, b1: Double): Double =
      rows.map { case (y, x) =>
        val r = y - (b0 + b1 * x)
        r * (tau - (if (r < 0) 1.0 else 0.0))
      }.sum
    val grid = for (b0 <- -2 to 2; b1i <- 4 to 11) yield (b0, b1i)
    val out = FitExtraQueries.quantileReg(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0.5, 0.9))
    out.foreach { case (tau, b0, b1, n, avgLoss) =>
      assert(n == rows.length.toLong)
      // argmin with the query's (loss, b0, b1) tie-break
      val best = grid.map { case (g0, g1i) =>
        (pinball(tau, g0.toDouble, g1i * 0.2), g0, g1i)
      }.minBy(t => (t._1, t._2, t._3))
      assert(b0 == best._2.toLong && math.abs(b1 - best._3 * 0.2) < 1e-9,
        s"tau=$tau argmin mismatch: got ($b0,$b1), want (${best._2},${best._3 * 0.2})")
      assert(math.abs(avgLoss - best._1 / rows.length) < tol)
      assert(avgLoss > 0.0)
    }
    // the tail fit cannot sit below the median fit's slope: the 0.9
    // quantile of price-per-quantity dominates the 0.5 quantile
    assert(out(1)._3 >= out(0)._3)
  }

  test("q_logit_step matches the closed-form Newton step from zero") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("round(o_totalprice/100000.0, 8) AS x",
        "CAST(CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS DOUBLE) AS y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum
    val sxx = rows.map(t => t._1 * t._1).sum
    val sy = rows.map(_._2 - 0.5).sum
    val sxy = rows.map(t => t._1 * (t._2 - 0.5)).sum
    val det = n * sxx - sx * sx
    val b0 = 4.0 * (sxx * sy - sx * sxy) / det
    val b1 = 4.0 * (n * sxy - sx * sy) / det
    val out = FitExtraQueries.logitStep(spark, sf).collect().head
    assert(out.getLong(0) == rows.length.toLong)
    assert(math.abs(out.getDouble(1) - b0) < tol, s"beta0 ${out.getDouble(1)} vs $b0")
    assert(math.abs(out.getDouble(2) - b1) < tol, s"beta1 ${out.getDouble(2)} vs $b1")
    val avgLl = out.getDouble(3)
    val acc = out.getDouble(4)
    // one Newton step from beta=0 must not be (much) worse than the
    // zero model's ln 2 — and accuracy is a proper fraction
    assert(avgLl > 0.0 && avgLl < 0.75)
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("q_als_step solves each item's 2x2 ridge normal equations") {
    val ratings = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .groupBy("o_custkey", "l_partkey")
      .agg(org.apache.spark.sql.functions.expr("sum(l_quantity) AS r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byItem = ratings.groupBy(_._2)
    val out = FitExtraQueries.alsStep(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.size == byItem.size)
    // full sweep: every item's closed-form ridge solve reproduced
    byItem.foreach { case (item, rs) =>
      def u1(c: Long) = ((c * 37 + 11) % 97) / 97.0 - 0.5
      def u2(c: Long) = ((c * 53 + 7) % 89) / 89.0 - 0.5
      val s11 = rs.map(t => u1(t._1) * u1(t._1)).sum + 0.1
      val s12 = rs.map(t => u1(t._1) * u2(t._1)).sum
      val s22 = rs.map(t => u2(t._1) * u2(t._1)).sum + 0.1
      val b1 = rs.map(t => u1(t._1) * t._3).sum
      val b2 = rs.map(t => u2(t._1) * t._3).sum
      val det = s11 * s22 - s12 * s12
      val (nR, t1, t2) = out(item)
      assert(nR == rs.length.toLong)
      assert(math.abs(t1 - (s22 * b1 - s12 * b2) / det) < tol, s"item $item t1")
      assert(math.abs(t2 - (s11 * b2 - s12 * b1) / det) < tol, s"item $item t2")
    }
  }
}
