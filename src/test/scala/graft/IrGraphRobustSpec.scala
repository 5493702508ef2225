package graft

import org.apache.spark.sql.functions._
import graft.queries.{IrGraphQueries, RobustQueries}

/** Semantic invariants of the round-3 operators (IrGraphQueries +
  * RobustQueries) — properties that hold regardless of data scale,
  * checked at sf0.001. Cross-engine value equality is the oracle
  * gate's job (tools/check.sh, run at all three SFs).
  */
class IrGraphRobustSpec extends GraftSpecBase {

  test("pagerank is a probability distribution over all 25 nations") {
    val rows = IrGraphQueries.pagerank(spark, sf).collect()
    assert(rows.length == 25)
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass $total (dangling-free graph)")
    assert(rows.forall(_.getDouble(1) >= 0.006 - 1e-9), "base rank floor")
  }

  test("bm25 scores are positive and only for matching docs") {
    val df = IrGraphQueries.bm25(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0.0), "BM25 of a present term is > 0")
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 2))
    // every scored doc really contains a query term
    val scored = rows.map(_.getLong(0)).toSet
    val matching = Tables.documents(spark, sf)
      .filter(col("text").contains("data") || col("text").contains("fast"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scored.subsetOf(matching))
  }

  test("rolling median lies within the frame's min/max (spot invariant)") {
    val rows = IrGraphQueries.rollingMedian(spark, sf)
      .limit(2000).collect()
    val (qmin, qmax) = (1.0, 50.0) // profiled l_quantity domain
    assert(rows.forall { r =>
      val m = r.getDouble(3); m >= qmin && m <= qmax })
  }

  test("ewma is a convex combination: bounded by the trailing values") {
    val e = Tables.events(spark, sf)
    val out = IrGraphQueries.ewma(spark, sf)
    // global bound is enough as an invariant: min(value) ≤ ewma ≤ max(value)
    val Array(lo, hi) = e.agg(min("value"), max("value")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    assert(out.filter(col("ewma") < lo - 1e-9 || col("ewma") > hi + 1e-9).count() == 0)
  }

  test("outlier fences: every flagged event is outside its type's fence") {
    val rows = IrGraphQueries.outlierIqr(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val v = r.getDouble(2); v < r.getDouble(3) || v > r.getDouble(4) })
  }

  test("pii masking leaves no digits in masked fields") {
    val rows = RobustQueries.piiMask(spark, sf).collect()
    assert(rows.length == 150)
    assert(rows.forall(r => !r.getString(1).exists(_.isDigit)), "name digits")
    assert(rows.forall(r => r.getString(2).matches("^[a-z]\\*\\*\\*@example\\.com$")),
      "email mask shape")
    assert(rows.forall(r => r.getString(3).endsWith("XX")), "phone suffix")
  }

  test("try_ family: errors become NULL, valid rows survive") {
    val df = RobustQueries.tryArith(spark, sf)
    // mixed inputs: rows with o_orderkey % 5 == 0 carry unparseable
    // strings ⇔ NULL; all other rows parse
    assert(df.filter((col("o_orderkey") % 5 === 0) =!= col("bad_int").isNull)
      .count() == 0)
    assert(df.filter((col("o_orderkey") % 5 === 0) =!= col("bad_ts").isNull)
      .count() == 0)
    assert(df.filter(col("no_elem").isNotNull).count() == 0)
    assert(df.filter(col("prio_num").isNull).count() == 0)
    // divisor o_orderkey % 3 == 0 ⇔ safe_div NULL
    assert(df.filter((col("o_orderkey") % 3 === 0) =!= col("safe_div").isNull)
      .count() == 0)
  }

  test("gini and hhi stay in their theoretical ranges") {
    val g = RobustQueries.gini(spark, sf).collect()
    assert(g.nonEmpty)
    assert(g.forall { r => val x = r.getDouble(1); x >= 0.0 && x < 1.0 })
    val h = RobustQueries.hhi(spark, sf).collect()
    assert(h.length == 5)
    // n equal shares give 10000/n ≤ HHI ≤ 10000
    assert(h.forall { r =>
      val x = r.getDouble(1); x >= 10000.0 / r.getLong(2) - 1e-6 && x <= 10000.0 + 1e-6 })
  }

  test("label balance: fractions sum to 1, weights ≥ 1, target = min class") {
    val rows = RobustQueries.labelBalance(spark, sf).collect()
    assert(rows.length == 10)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    assert(rows.forall(_.getDouble(3) >= 1.0 - 1e-9))
    val minN = rows.map(_.getLong(1)).min
    assert(rows.forall(_.getLong(4) == minN))
  }

  test("win_nth: second_price is NULL iff the customer has one order") {
    val rows = RobustQueries.winNth(spark, sf).collect()
    assert(rows.forall { r => (r.getLong(4) >= 2) == !r.isNullAt(2) })
  }

  test("str_to_map parses all three keys") {
    val df = RobustQueries.strToMap(spark, sf)
    assert(df.filter(col("n_keys") =!= 3).count() == 0)
    assert(df.filter(col("prio_v") < 1 || col("prio_v") > 5).count() == 0)
  }
}
