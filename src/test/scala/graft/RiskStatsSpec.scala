package graft

import org.apache.spark.sql.functions._
import graft.queries.RiskStatsQueries

/** Invariants for the round-4 tail/seasonal/shrinkage/privacy family
  * (sf0.001). */
class RiskStatsSpec extends GraftSpecBase {

  test("hill tail index: k=49, positive mean log-ratio, alpha = 1/mean") {
    val rows = RiskStatsQueries.tailIndex(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 49)
      val (mean, alpha) = (r.getDouble(2), r.getDouble(3))
      assert(mean > 0, "top values dominate the 50th")
      assert(math.abs(alpha - 1.0 / mean) < 1e-2)
    }
  }

  test("seasonal decomposition reassembles: v = trend + seasonal + resid") {
    val rows = RiskStatsQueries.seasonalDecomp(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, tr, se, re) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(v - (tr + se + re)) < 1e-3,
        "additive components reassemble the series")
    }
  }

  test("EB shrinkage pulls extreme rates toward the prior mean") {
    val rows = RiskStatsQueries.ebShrinkage(spark, sf).collect()
    val alpha = rows.head.getDouble(4)
    val beta = rows.head.getDouble(5)
    assert(alpha > 0 && beta > 0)
    val prior = alpha / (alpha + beta)
    rows.foreach { r =>
      val (raw, shrunk) = (r.getDouble(3), r.getDouble(6))
      assert(shrunk >= 0.0 && shrunk <= 1.0)
      // posterior mean lies between the raw rate and the prior mean
      assert(shrunk >= math.min(raw, prior) - 1e-9 &&
        shrunk <= math.max(raw, prior) + 1e-9)
    }
  }

  test("k-anonymity: at-risk bounded by population, shares in [0,1]") {
    val rows = RiskStatsQueries.kAnonymity(spark, sf).collect()
    val total = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "small classes are a subset")
      assert(r.getLong(4) <= r.getLong(3))
      val share = r.getDouble(5)
      assert(share >= 0.0 && share <= 1.0)
    }
  }
}
