package graft

import org.apache.spark.sql.functions._
import graft.queries.{BizSeriesQueries, GraphQueries, MlEvalQueries}

/** Semantic invariants of the round-3 operators (MlEvalQueries +
  * GraphQueries + BizSeriesQueries) — properties that hold at any
  * scale, checked at sf0.001. Cross-engine value equality is the
  * oracle gate's job (tools/check.sh, run at all three SFs).
  */
class MlGraphBizSpec extends GraftSpecBase {

  test("auc is in [0,1] and counts partition the table") {
    val r = MlEvalQueries.auc(spark, sf).collect()(0)
    val n = Tables.events(spark, sf).count()
    assert(r.getLong(0) + r.getLong(1) == n)
    val a = r.getDouble(2)
    assert(a >= 0.0 && a <= 1.0)
  }

  test("confusion matrix counts partition the table; f1 between p and r") {
    val r = MlEvalQueries.confusion(spark, sf).collect()(0)
    val n = Tables.events(spark, sf).count()
    assert((0 to 3).map(r.getLong).sum == n)
    val (p, rec, f1) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(f1 >= math.min(p, rec) - 1e-9 && f1 <= math.max(p, rec) + 1e-9,
      "F1 is a (harmonic) mean of precision and recall")
  }

  test("chi2 cells: expected sums to N, contributions to the statistic") {
    val rows = MlEvalQueries.chi2(spark, sf).collect()
    val n = Tables.events(spark, sf).count()
    assert(math.abs(rows.map(_.getDouble(3)).sum - n) < 0.01,
      "sum of expected = N")
    val chi2 = rows.head.getDouble(5)
    assert(math.abs(rows.map(_.getDouble(4)).sum - chi2) < 0.01)
    assert(rows.forall(_.getDouble(5) == chi2), "statistic replicated per cell")
  }

  test("ndcg is in (0,1] and dcg ≤ idcg") {
    val rows = MlEvalQueries.ndcg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-9, "DCG ≤ ideal DCG")
      val nd = r.getDouble(3)
      assert(nd > 0.0 && nd <= 1.0 + 1e-9)
    }
  }

  test("mrr: rr = 1/first_pos; users without purchases are NULL") {
    val rows = MlEvalQueries.mrr(spark, sf).collect()
    rows.foreach { r =>
      if (!r.isNullAt(1))
        assert(math.abs(r.getDouble(2) -
          1.0 / r.getAs[Number](1).longValue()) < 1e-6)
      else assert(r.isNullAt(2))
    }
  }

  test("benford: fractions sum to ~1 over digits 1-9") {
    val rows = MlEvalQueries.benford(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
  }

  test("degree: undirected degree bounded by in+out; at most V-1") {
    val rows = GraphQueries.degree(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (out, in, und) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(und <= 24, "simple graph degree bound")
      assert(und <= in + out, "every neighbor appears in some direction")
    }
  }

  test("triangles: per-node counts sum to 3× the total") {
    val rows = GraphQueries.triangles(spark, sf).collect()
    val total = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == total))
    assert(rows.map(_.getLong(1)).sum == 3 * total)
  }

  test("shortest path: dist 0 only at the source; neighbors of 0 get 1") {
    val rows = GraphQueries.shortestPath(spark, sf).collect()
    val d = rows.map(r => r.getAs[Number](0).longValue() ->
      (if (r.isNullAt(1)) Long.MaxValue else r.getAs[Number](1).longValue())).toMap
    assert(d(0L) == 0L)
    assert(d.filter(_._2 == 0L).keySet == Set(0L))
  }

  test("right join keeps every customer") {
    val df = BizSeriesQueries.joinRight(spark, sf)
    assert(df.select("c_custkey").distinct().count() ==
      Tables.customer(spark, sf).count())
  }

  test("union by name aligns columns; missing sides are NULL") {
    val df = BizSeriesQueries.unionByName(spark, sf)
    assert(df.columns.toSeq == Seq("id", "amount", "src", "prio"))
    assert(df.filter(col("src") === "open" && col("amount").isNotNull).count() == 0)
    assert(df.filter(col("src") === "closed" && col("prio").isNotNull).count() == 0)
  }

  test("ohlc: low ≤ open/close ≤ high, volume ≥ 1") {
    val rows = BizSeriesQueries.ohlc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5))
      assert(l <= o + 1e-9 && o <= h + 1e-9)
      assert(l <= c + 1e-9 && c <= h + 1e-9)
      assert(r.getLong(6) >= 1)
    }
  }

  test("drawdown is in [-1, 0]") {
    val rows = BizSeriesQueries.drawdown(spark, sf).collect()
    rows.foreach { r =>
      val dd = r.getDouble(2)
      assert(dd <= 0.0 && dd >= -1.0)
    }
  }

  test("rfm: scores in 1-4, segment matches the three scores") {
    val rows = BizSeriesQueries.rfm(spark, sf).collect()
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getInt(4), r.getInt(5), r.getInt(6))
      Seq(rs, fs, ms).foreach(x => assert(x >= 1 && x <= 4))
      assert(r.getString(7) == s"$rs$fs$ms")
    }
  }

  test("pareto: cum_frac is nondecreasing in rank and ends at 1") {
    val rows = BizSeriesQueries.pareto(spark, sf).orderBy("rnk").collect()
    val fracs = rows.map(_.getDouble(3))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(fracs.last - 1.0) < 1e-6)
    // tier A is a prefix
    val tiers = rows.map(_.getString(4))
    assert(tiers.dropWhile(_ == "A").forall(_ == "B"))
  }
}
