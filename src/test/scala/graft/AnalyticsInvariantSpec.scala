package graft

import org.apache.spark.sql.functions._
import graft.queries._

/** Invariants for the round-3 tail batches (attribution, Markov,
  * TWAP, grouping_id, provenance, log-odds, scaling, CDF, KS,
  * effect size, association rules) at sf0.001.
  */
class AnalyticsInvariantSpec extends GraftSpecBase {

  test("attribution shares sum to 1 over channels") {
    val rows = AttributionQueries.attribution(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    assert(rows.forall(_.getString(0) != "purchase"),
      "a purchase never credits itself")
  }

  test("markov rows are probability distributions per cur") {
    val rows = AttributionQueries.markov(spark, sf).collect()
    val byCur = rows.groupBy(_.getString(0))
    byCur.foreach { case (cur, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 0.01, cur)
      assert(rs.map(_.getInt(4)).sorted.toSeq == (1 to rs.length), cur)
    }
  }

  test("twap lies within the observed value range per user") {
    val rows = TwapGroupingQueries.twap(spark, sf).collect()
    val bounds = Tables.events(spark, sf).groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getLong(0))
      val t = r.getDouble(3)
      assert(t >= lo - 0.01 && t <= hi + 0.01)
    }
  }

  test("grouping_id partitions the cube: gid bitmask consistent with flags") {
    val rows = TwapGroupingQueries.groupingId(spark, sf).collect()
    rows.foreach { r =>
      val gid = r.getLong(3)
      assert(gid == r.getByte(4) * 2 + r.getByte(5),
        "gid = g_status·2 + g_prio")
      assert((gid == 3) == (r.isNullAt(0) && r.isNullAt(1)))
    }
    // the grand total appears exactly once
    assert(rows.count(_.getLong(3) == 3L) == 1)
  }

  test("source profile shares sum to 1; top_lang is one of the source's langs") {
    val rows = SourceTermQueries.sourceProfile(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 0.02)
    assert(rows.forall(r => Set("de", "en", "es", "fr", "zh")(r.getString(4))))
  }

  test("log odds: 3 terms per language, scores descending") {
    val rows = SourceTermQueries.logOdds(spark, sf).collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.size == 5)
    byLang.values.foreach { rs =>
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("minmax scaling lands in [0,1]") {
    val rows = DistributionQueries.minmaxNorm(spark, sf).collect()
    rows.foreach { r =>
      val x = r.getDouble(6)
      assert(x >= -1e-9 && x <= 1.0 + 1e-9)
    }
  }

  test("cdf is monotone over the probe points and ≤ 1") {
    val rows = DistributionQueries.cdf(spark, sf).collect()
    rows.foreach { r =>
      val fs = (2 to 6).map(r.getDouble)
      assert(fs.zip(fs.tail).forall { case (a, b) => a <= b + 1e-9 })
      assert(fs.last <= 1.0 + 1e-9 && fs.head >= 0.0)
    }
  }

  test("ks distance in [0,1]; counts partition the table") {
    val r = InferenceQueries.ksTest(spark, sf).collect()(0)
    assert(r.getLong(0) + r.getLong(1) == Tables.events(spark, sf).count())
    val d = r.getDouble(2)
    assert(d >= 0.0 && d <= 1.0)
  }

  test("cohen's d consistent with the sign of the mean difference") {
    val r = InferenceQueries.cohensD(spark, sf).collect()(0)
    val dm = r.getDouble(2) - r.getDouble(3)
    assert(math.signum(r.getDouble(4)) == math.signum(dm) || dm == 0.0)
  }

  test("association rules: confidence ≥ support, lift consistent") {
    val rows = InferenceQueries.assocRules(spark, sf).collect()
    assert(rows.length == 20, "5×4 ordered type pairs")
    rows.foreach { r =>
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9, "conf ≥ support")
      assert(r.getDouble(3) <= 1.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0)
    }
  }
}
