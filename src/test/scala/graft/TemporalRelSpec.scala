package graft

import org.apache.spark.sql.functions._
import graft.queries.TemporalRelQueries

/** Invariants for the round-4 temporal-relational family (sf0.001). */
class TemporalRelSpec extends GraftSpecBase {

  test("share-of-parent: leaf shares sum to 1 within parents, parents to 1 overall") {
    val rows = TemporalRelQueries.shareOfParent(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-3)
    }
    val parentShares = rows.groupBy(_.getString(0))
      .map(_._2.head.getDouble(4)).sum
    assert(math.abs(parentShares - 1.0) < 1e-3)
  }

  test("temporal join covers every order exactly once") {
    val rows = TemporalRelQueries.temporalJoin(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "each order matches exactly one version interval")
  }

  test("PIT features are causally valid: past counts below the total, first is 0") {
    val rows = TemporalRelQueries.pitFeatures(spark, sf).collect()
    val perCust = rows.groupBy(_.getLong(1))
    perCust.foreach { case (_, g) =>
      assert(g.map(_.getLong(2)).min == 0, "some order sees an empty past")
      assert(g.map(_.getLong(2)).max == g.length - 1,
        "the last order sees all predecessors")
    }
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("tempered mixing weights sum to 1 and upsample low-resource sources") {
    val rows = TemporalRelQueries.mixTemper(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    // temperature < 1 compresses the range: the smallest share gains
    val bySmall = rows.sortBy(_.getDouble(3))
    assert(bySmall.head.getDouble(5) >= bySmall.last.getDouble(5),
      "smallest source upsampled at least as much as the largest")
  }
}
