package graft

import org.apache.spark.sql.functions._

/** Structural properties of the round-4 marquee additions that the
  * value-level oracle can't express: MMR's greedy invariants,
  * isotonic monotonicity + mean preservation, and the growth-
  * accounting identity. */
class NewOpsPropertySpec extends GraftSpecBase {

  test("q_mmr_select: 5 distinct picks, rank-1 is argmax relevance, " +
      "scores non-increasing") {
    val rows = queries.MmrQueries.mmrSelect(spark, sf)
      .orderBy(col("sel_rank")).collect()
    assert(rows.length == 5)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 5)
    val rels = rows.map(_.getAs[Double]("rel"))
    // rank 1 maximizes relevance over the whole candidate pool
    assert(rels.tail.forall(_ <= rels.head + 1e-9))
    // greedy MMR scores are non-increasing in rank (the argmax at
    // round r+1 was available at round r with a no-larger penalty)
    val scores = rows.map(_.getAs[Double]("score"))
    scores.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"scores increased: $a -> $b") }
  }

  test("q_isotonic: fitted rates are monotone and preserve the " +
      "weighted mean") {
    val rows = queries.IsotonicQueries.isotonic(spark, sf)
      .orderBy(col("bin")).collect()
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    iso.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-8, s"isotonic fit decreased: $a -> $b") }
    val n = rows.map(_.getAs[Long]("n").toDouble)
    val emp = rows.map(_.getAs[Double]("emp_rate"))
    val wEmp = n.zip(emp).map { case (w, r) => w * r }.sum
    val wIso = n.zip(iso).map { case (w, r) => w * r }.sum
    // PAVA preserves the weighted average (up to the 6dp reporting
    // rounding on each bin rate)
    assert(math.abs(wEmp - wIso) <= 1e-4 * n.sum + 1e-6,
      s"weighted mean not preserved: $wEmp vs $wIso")
  }

  test("q_growth_acct: the DAU accounting identity holds on every row") {
    val rows = queries.GrowthAcctQueries.growthAcct(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("identity_ok")))
  }

  test("q_bass_fit: single row; implied market size (when defined) " +
      "is positive and at least the observed adopters") {
    val rows = queries.BassQueries.bassFit(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    if (!r.isNullAt(r.fieldIndex("m"))) {
      val m = r.getAs[Double]("m")
      assert(m > 0.0, s"non-positive market size $m")
    }
  }
}
