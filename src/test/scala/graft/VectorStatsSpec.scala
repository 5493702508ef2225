package graft

import org.apache.spark.sql.functions._
import graft.queries.VectorStatsQueries

/** Invariants for the round-4 vector-statistics family (sf0.001). */
class VectorStatsSpec extends GraftSpecBase {

  test("inertia and norms are positive; every label covered") {
    val rows = VectorStatsQueries.embInertia(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select(col("label"))
      .distinct().count()
    assert(rows.length == labels)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "inertia is a mean of squares")
      assert(r.getDouble(3) > 0.0, "vectors have positive norm")
    }
  }

  test("dimension variances are non-negative and ranks are a permutation") {
    val rows = VectorStatsQueries.dimVariance(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(4)).sorted.toSeq == (1 to 64))
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("grouped weighted median: weight on each side covers half") {
    val rows = VectorStatsQueries.weightedQuantile(spark, sf).collect()
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val (g, tw, wm) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val grp = data.filter(_._1 == g)
      assert(tw == grp.map(_._3).sum)
      val below = grp.filter(_._2 <= wm).map(_._3).sum
      assert(below * 2 >= tw, s"weight at/below the median covers half in $g")
    }
  }
}
