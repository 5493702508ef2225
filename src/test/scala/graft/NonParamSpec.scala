package graft

import graft.queries.NonParamQueries

/** Invariants for the round-4 nonparametric family (sf0.001). */
class NonParamSpec extends GraftSpecBase {

  test("AM >= GM >= HM for every type (Pythagorean mean inequality)") {
    NonParamQueries.gmean(spark, sf).collect().foreach { r =>
      val (am, gm, hm) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(am >= gm - 1e-6 && gm >= hm - 1e-6, s"$am >= $gm >= $hm")
      assert(hm > 0)
    }
  }

  test("runs test: run count within [1, n], balanced signs around the median") {
    NonParamQueries.runsTest(spark, sf).collect().foreach { r =>
      val (runs, n1, n2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(runs >= 1 && runs <= n1 + n2)
      // exact median split: counts differ by at most the tie count + 1
      assert(math.abs(n1 - n2) <= 2)
      assert(!r.getDouble(5).isNaN)
    }
  }

  test("mann-kendall: |S| bounded by the pair count, tau in [-1, 1]") {
    NonParamQueries.mannKendall(spark, sf).collect().foreach { r =>
      val (np, s) = (r.getLong(1), r.getLong(2))
      assert(math.abs(s) <= np)
      assert(math.abs(r.getDouble(3)) <= 1.0)
    }
  }
}
