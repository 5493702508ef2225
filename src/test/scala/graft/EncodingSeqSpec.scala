package graft

import org.apache.spark.sql.functions._
import graft.queries.EncodingSeqQueries

/** Semantic invariants of the nearest join, encoding scalars, and
  * installment generator, checked at sf0.001.
  */
class EncodingSeqSpec extends GraftSpecBase {

  test("nearest join: |Δt| never beats the chosen candidate (spot check)") {
    val rows = EncodingSeqQueries.joinNearest(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(5) >= 0), "|Δt| is nonnegative")
    // the asof (backward) answer can never be strictly closer than
    // the nearest answer
    val asof = graft.queries.JoinQueries.joinAsof(spark, sf)
      .select(col("p_id"), col("signup_ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val nearest = rows.map(r => r.getLong(0) ->
      (r.getTimestamp(2), r.getTimestamp(3), r.getLong(5))).toMap
    nearest.foreach { case (pid, (pTs, _, dtUs)) =>
      asof.get(pid).foreach { bTs =>
        val bwdDt = math.abs(pTs.getTime - bTs.getTime) * 1000L
        assert(dtUs <= bwdDt + 1000, s"purchase $pid: nearest beats backward")
      }
    }
  }

  test("encoding: round-trip always true, chr in A..Z, bits ≥ 0") {
    val rows = EncodingSeqQueries.encoding(spark, sf).collect()
    assert(rows.forall(_.getBoolean(3)), "base64 round trip")
    assert(rows.forall { r => val c = r.getString(6); c >= "A" && c <= "Z" })
    assert(rows.forall(_.getAs[Number](4).longValue() >= 0))
  }

  test("installments: per-order amounts sum exactly to the total") {
    val df = EncodingSeqQueries.installments(spark, sf)
    val sums = df.groupBy("o_orderkey")
      .agg(round(sum(col("amount")), 2).as("total"),
        count(lit(1)).as("n"), max("n_inst").as("n_inst"))
    val bad = sums.join(Tables.orders(spark, sf), "o_orderkey")
      .filter(round(col("total") - round(col("o_totalprice"), 2), 2) =!= 0.0)
    assert(bad.count() == 0, "installments reassemble the order total")
    assert(sums.filter(col("n") =!= col("n_inst")).count() == 0)
  }
}
