package graft

import org.apache.spark.sql.functions._
import graft.queries.{BasketQueries, ChurnZipfQueries, HitsFunnelQueries}

/** Invariants for the churn/Zipf/HITS/funnel/basket operators at
  * sf0.001.
  */
class RetailGraphSpec extends GraftSpecBase {

  test("churn: rate replicated and equals the flagged fraction") {
    val rows = ChurnZipfQueries.churn(spark, sf).collect()
    val rate = rows.head.getDouble(5)
    assert(rows.forall(_.getDouble(5) == rate))
    val flagged = rows.count(_.getBoolean(4)).toDouble / rows.length
    assert(math.abs(rate - flagged) < 0.001)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
  }

  test("zipf: rank 1 is the most frequent token; slope is negative") {
    val rows = ChurnZipfQueries.zipf(spark, sf).collect()
    assert(rows.length == 5)
    val fs = rows.sortBy(_.getInt(0)).map(_.getLong(2))
    assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getDouble(4) < 0.0, "log-log slope negative")
    assert(rows.forall(_.getLong(3) <= 31), "closed fixture vocabulary")
  }

  test("hits: hub1 equals the weighted out-degree; scores nonnegative") {
    val rows = HitsFunnelQueries.hits(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(2) >= 0 && r.getLong(3) >= 0)
      // h2 = A·a2 dominates h1 whenever the node has any out-edge
      if (r.getLong(1) > 0) assert(r.getLong(3) > r.getLong(1))
    }
  }

  test("bounded funnel: counts shrink monotonically; conversions ≤ 1") {
    val rows = HitsFunnelQueries.funnelWindow(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("view", "click_1h", "purchase_1h"))
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    rows.tail.foreach(r => assert(r.getDouble(3) <= 1.0 + 1e-9))
  }

  test("copurchase: co ≤ min part count; pairs oriented p1 < p2") {
    val rows = BasketQueries.copurchase(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("reorder rate: repeaters ≤ buyers; orders-per-buyer ≥ 1") {
    val rows = BasketQueries.reorderRate(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) >= 1.0 - 1e-9)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
