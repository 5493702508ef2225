package graft

import graft.queries.ExperimentQueries

/** Invariants for the round-4 experimentation family (sf0.001). */
class ExperimentSpec extends GraftSpecBase {

  test("DiD equals the difference of the group deltas") {
    val r = ExperimentQueries.did(spark, sf).collect().head
    val (td, cd, did) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(math.abs(did - (td - cd)) < 1e-9)
  }

  test("CUPED variance ratio is in [0, 1] (adjustment cannot hurt)") {
    val rows = ExperimentQueries.cuped(spark, sf).collect()
    assert(rows.nonEmpty)
    val vr = rows.head.getDouble(5)
    assert(vr >= 0.0 - 1e-9 && vr <= 1.0 + 1e-9,
      "1 - rho^2 by construction")
    // the adjusted metric actually has lower sample variance
    val ys = rows.map(_.getDouble(2))
    val yc = rows.map(_.getDouble(3))
    def variance(a: Array[Double]): Double = {
      val m = a.sum / a.length
      a.map(v => (v - m) * (v - m)).sum / a.length
    }
    assert(variance(yc) <= variance(ys) + 1e-6)
  }

  test("Theil index is non-negative (Jensen) for every type") {
    ExperimentQueries.theil(spark, sf).collect().foreach { r =>
      assert(r.getDouble(2) >= -1e-9)
    }
  }
}
