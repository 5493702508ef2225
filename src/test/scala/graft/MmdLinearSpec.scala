package graft

import org.apache.spark.sql.functions._

import graft.queries.EmbAggQueries

/** Pins the linear-time MMD estimator's DISTRIBUTED PLUMBING — the
  * salted pairing, consecutive-by-rank matching, truncate-to-min
  * quadruple join — bit-for-bit against a driver-side reference
  * pairing on the fixture (the kernel itself is the same Spark
  * expression on both sides, so the comparison isolates exactly the
  * part mmdLinear adds over the exact q_mmd). Gretton et al. 2012 §6:
  * any value-independent fixed pairing yields an unbiased estimator;
  * determinism here comes from (murmur3 bucket, vec_id rank). */
class MmdLinearSpec extends GraftSpecBase {

  private def kernel(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    val base = lit(1.0) +
      round(graft.functions.expressions.FloatVecDot.dot(a, b), 3) / lit(64.0)
    round(base * base, 8)
  }

  /** Driver-side reference: same buckets from Spark's own hash (so
    * murmur3 matches by construction), pairing and index matching
    * replayed in plain Scala. */
  private def referenceQuads(buckets: Int)
      : Seq[(Array[Float], Array[Float], Array[Float], Array[Float])] = {
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"),
        pmod(hash(col("vec_id")), lit(buckets)).as("bkt"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray, r.getInt(3)))
    def pairsOf(lbl: Int): Map[(Int, Long), (Array[Float], Array[Float])] =
      rows.filter(_._2 == lbl).groupBy(_._4).flatMap { case (bkt, vs) =>
        vs.sortBy(_._1).grouped(2).zipWithIndex.collect {
          case (Array(a, b), i) => (bkt, (i + 1).toLong) -> (a._3, b._3)
        }
      }
    val px = pairsOf(0)
    val py = pairsOf(1)
    (px.keySet intersect py.keySet).toSeq.sorted.map { key =>
      val (xa, xb) = px(key); val (ya, yb) = py(key)
      (xa, xb, ya, yb)
    }
  }

  private def check(buckets: Int): Unit = {
    val out = EmbAggQueries.mmdLinear(spark, sf, buckets).collect().head
    val quads = referenceQuads(buckets)
    assert(out.getLong(1) == quads.size.toLong,
      s"n_quads must equal the reference pairing's quadruple count (buckets=$buckets)")
    val s = spark
    import s.implicits._
    val expected = quads.toDF("xa", "xb", "ya", "yb")
      .agg(round(avg(kernel(col("xa"), col("xb"))
        + kernel(col("ya"), col("yb"))
        - kernel(col("xa"), col("yb"))
        - kernel(col("xb"), col("ya"))), 8))
      .collect().head.getDouble(0)
    assert(math.abs(out.getDouble(0) - expected) < 1e-9,
      s"mmd2_lin ${out.getDouble(0)} != reference $expected (buckets=$buckets)")
  }

  test("linear MMD matches the driver-side reference pairing (default 64 buckets)") {
    check(64)
  }

  test("the bucket dial only re-pairs, never breaks the estimator (7 buckets)") {
    check(7)
  }

  test("linear estimate agrees with the exact MMD^2 within estimator noise") {
    // the fixture's label clouds OVERLAP under the polynomial kernel
    // (exact mmd2 ≈ -1e-4 at sf0.001 — a degenerate-U statistic may
    // go slightly negative), so the coarse statistical sanity is
    // agreement in MAGNITUDE, not sign: both say "no separation".
    // The estimator's noise scale is the h-statistic's stddev/√m;
    // kernel values here are O(1), so 0.5 is an ultra-loose band that
    // still catches a wrong-by-construction estimator (e.g. a sign
    // flip on the cross terms turns the estimate into ≈ +2·E[k] ≈ 2).
    val exact = EmbAggQueries.mmd(spark, sf).collect().head
      .getAs[Double]("mmd2")
    val lin = EmbAggQueries.mmdLinear(spark, sf).collect().head.getDouble(0)
    info(f"exact mmd2 = $exact%.6f, linear estimate = $lin%.6f")
    assert(math.abs(lin - exact) < 0.5,
      s"linear estimate $lin should be within estimator noise of exact $exact")
  }
}
