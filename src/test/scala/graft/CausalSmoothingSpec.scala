package graft

import org.apache.spark.sql.functions._
import graft.queries.{CausalDesignQueries, SmoothingLmQueries}

/** Independent references for the round-11 causal-design and
  * LM-smoothing entries: each result recomputed in plain Scala from
  * the same sf0.001 rows; the sf0.01 oracle gate certifies the exact
  * cross-engine hashes. */
class CausalSmoothingSpec extends GraftSpecBase {

  private val tol = 1e-4

  test("q_kneser_ney matches hand-computed KN probabilities and conserves mass") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val ws = t.toLowerCase.split(" ", -1)
      if (ws.length < 2) Nil else ws.sliding(2).map(a => (a(0), a(1))).toSeq
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size.toLong) } // (count, N1+ forward)
    val n1bw = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nbb = c12.size.toDouble
    val D = 0.75
    def pkn(w1: String, w2: String): Double = {
      val (cw1, n1fw) = c1(w1)
      math.max(c12((w1, w2)) - D, 0.0) / cw1 +
        (D * n1fw / cw1) * (n1bw(w2) / nbb)
    }
    val out = SmoothingLmQueries.kneserNey(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      // read by name — the join reorders key columns in the row layout
      val W1 = r.getAs[String]("w1"); val W2 = r.getAs[String]("w2")
      val C = r.getAs[Long]("c12"); val P = r.getAs[Double]("p_kn")
      assert(C == c12((W1, W2)))
      assert(math.abs(P - pkn(W1, W2)) < tol, s"($W1,$W2): $P vs ${pkn(W1, W2)}")
      assert(P > 0.0 && P <= 1.0)
    }
    // top-20 really are the most frequent bigrams
    val minTop = out.map(_.getAs[Long]("c12")).min
    val maxRest = c12.values.toSeq.sorted.reverse.drop(20).headOption.getOrElse(0L)
    assert(minTop >= maxRest)
    // interpolated KN conserves probability mass: for any seen w1,
    // sum over the seen continuations + the backed-off mass over the
    // whole continuation vocabulary is exactly 1
    val w1probe = c12.keys.head._1
    val (cw1, n1fw) = c1(w1probe)
    val seenMass = c12.collect { case ((a, _), c) if a == w1probe =>
      math.max(c - D, 0.0) / cw1 }.sum
    val contMass = (D * n1fw / cw1) * (n1bw.values.sum / nbb)
    assert(math.abs(seenMass + contMass - 1.0) < 1e-9)
  }

  test("q_power_size matches the closed-form per-segment sample size") {
    val rows = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val out = CausalDesignQueries.powerSize(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    rows.groupBy(_._1).foreach { case (seg, xs) =>
      val n = xs.length
      val p1 = xs.count(_._2 > 5000.0).toDouble / n
      val p2 = math.min(0.999, p1 * 1.2)
      val pbar = (p1 + p2) / 2.0
      val term = 1.959964 * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
        0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
      val want = math.ceil(term * term / ((p2 - p1) * (p2 - p1)))
      val (gotN, gotP1, gotP2, gotArm) = out(seg)
      assert(gotN == n.toLong)
      assert(math.abs(gotP1 - p1) < tol && math.abs(gotP2 - p2) < tol)
      assert(math.abs(gotArm - want) <= 1.0, s"$seg: $gotArm vs $want")
    }
  }

  private def units() = {
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").agg(expr("sum(round(o_totalprice, 2)) AS y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect().map { r =>
        // mirror the query's 8dp score rounding: the weights divide
        // by ps, so an unrounded reference drifts ~1e-3 per row
        def r8(x: Double) =
          BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        val ps = r8(1.0 / (1.0 +
          math.exp(-(r8(r.getDouble(3) / 10000.0) - 0.5))))
        (r.getLong(0), r.getInt(1), r.getString(2) == "BUILDING",
          math.min(0.95, math.max(0.05, ps)),
          spend.getOrElse(r.getLong(0), 0.0))
      }
  }

  test("q_ipw_ate matches the trimmed HT and Hajek references") {
    val us = units()
    // mirror the query's 6dp per-term rounding: the Hajek ratio
    // multiplies a ~1e-7 relative weight perturbation by the ~1e5
    // outcome scale, so an unrounded reference lands ~0.07 away
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ht = us.map { case (_, _, tr, p, y) =>
      if (tr) r6(y / p) else -r6(y / (1.0 - p)) }.sum / us.length
    val sTy = us.collect { case (_, _, true, p, y) => r6(y / p) }.sum
    val sTw = us.collect { case (_, _, true, p, _) => r6(1.0 / p) }.sum
    val sCy = us.collect { case (_, _, false, p, y) => r6(y / (1.0 - p)) }.sum
    val sCw = us.collect { case (_, _, false, p, _) => r6(1.0 / (1.0 - p)) }.sum
    val hajek = sTy / sTw - sCy / sCw
    val out = graft.queries.CausalDesignQueries.ipwAte(spark, sf)
      .collect().head
    assert(out.getLong(0) == us.length.toLong)
    assert(out.getLong(1) == us.count(_._3).toLong)
    assert(math.abs(out.getDouble(2) - ht) < 0.02, s"ht ${out.getDouble(2)} vs $ht")
    assert(math.abs(out.getDouble(3) - hajek) < 0.02)
  }

  test("q_aipw_dr matches the augmented-IPW reference") {
    val us = units()
    def armMean(xs: Seq[(Long, Int, Boolean, Double, Double)]) =
      if (xs.isEmpty) None else Some(xs.map(_._5).sum / xs.length)
    val mu1g = armMean(us.filter(_._3).toSeq).get
    val mu0g = armMean(us.filterNot(_._3).toSeq).get
    val byNat = us.groupBy(_._2)
    val phi = us.map { case (_, nat, tr, p, y) =>
      val blk = byNat(nat)
      val mu1 = armMean(blk.filter(_._3).toSeq).getOrElse(mu1g)
      val mu0 = armMean(blk.filterNot(_._3).toSeq).getOrElse(mu0g)
      val t = if (tr) 1.0 else 0.0
      mu1 - mu0 + t * (y - mu1) / p - (1.0 - t) * (y - mu0) / (1.0 - p)
    }
    val out = graft.queries.CausalDesignQueries.aipwDr(spark, sf)
      .collect().head
    assert(out.getLong(0) == us.length.toLong)
    assert(math.abs(out.getDouble(1) - phi.sum / phi.length) < 0.02,
      s"dr ${out.getDouble(1)} vs ${phi.sum / phi.length}")
    assert(math.abs(out.getDouble(2) - mu1g) < 0.01)
    assert(math.abs(out.getDouble(3) - mu0g) < 0.01)
  }

  test("q_uplift_bins matches per-band uplift and cumulative Qini") {
    val us = units() // (key, nat, treated, ps-trimmed, y) — trimming
    // does not move band membership here (bands are 0.2-wide and the
    // trim clamps at 0.05/0.95, inside bands 0 and 4)
    val byBand = us.groupBy(u => math.min(4, (u._4 * 5.0).toInt))
    val out = graft.queries.CausalDesignQueries.upliftBins(spark, sf)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out.keySet == byBand.keySet)
    byBand.foreach { case (b, xs) =>
      val t = xs.filter(_._3); val c = xs.filterNot(_._3)
      val (nT, nC, uplift, qini) = out(b)
      assert(nT == t.length.toLong && nC == c.length.toLong)
      if (t.nonEmpty && c.nonEmpty)
        assert(math.abs(uplift.get
          - (t.map(_._5).sum / t.length - c.map(_._5).sum / c.length)) < 0.01)
      val cumXs = byBand.filter(_._1 >= b).values.flatten
      val ct = cumXs.filter(_._3); val cc = cumXs.filterNot(_._3)
      if (cc.nonEmpty)
        assert(math.abs(qini.get - (ct.map(_._5).sum
          - cc.map(_._5).sum * ct.size.toDouble / cc.size)) < 0.02,
          s"band $b qini")
    }
  }

  test("q_rdd_effect matches two closed-form local OLS fits") {
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").agg(expr("sum(round(o_totalprice, 2)) AS y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pts = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .filter(t => t._2 >= 2500.0 && t._2 <= 7500.0)
      .map { case (k, bal) =>
        ((bal - 5000.0) / 1000.0, bal >= 5000.0,
          spend.getOrElse(k, 0.0) / 100000.0)
      }
    def ols(side: Array[(Double, Boolean, Double)]) = {
      val n = side.length.toDouble
      val sx = side.map(_._1).sum; val sy = side.map(_._3).sum
      val sxx = side.map(t => t._1 * t._1).sum
      val sxy = side.map(t => t._1 * t._3).sum
      val det = n * sxx - sx * sx
      ((sxx * sy - sx * sxy) / det, (n * sxy - sx * sy) / det)
    }
    val (aLo, bLo) = ols(pts.filterNot(_._2))
    val (aHi, bHi) = ols(pts.filter(_._2))
    val out = graft.queries.CausalDesignQueries.rddEffect(spark, sf)
      .collect().head
    assert(out.getLong(0) == pts.count(!_._2).toLong)
    assert(out.getLong(1) == pts.count(_._2).toLong)
    assert(math.abs(out.getDouble(2) - aLo) < tol)
    assert(math.abs(out.getDouble(3) - aHi) < tol)
    assert(math.abs(out.getDouble(4) - bLo) < tol)
    assert(math.abs(out.getDouble(5) - bHi) < tol)
    assert(math.abs(out.getDouble(6) - (aHi - aLo)) < tol)
  }

  test("q_iv_wald matches the Wald ratio reference") {
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").agg(expr("sum(round(o_totalprice, 2)) AS y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val us = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_acctbal").collect()
      .map { r =>
        val k = r.getLong(0); val bal = r.getDouble(1)
        val z = k % 2 == 0
        val t = if (z) bal > 3000.0 else bal > 7000.0
        (z, if (t) 1.0 else 0.0, spend.getOrElse(k, 0.0) / 100000.0)
      }
    val z1 = us.filter(_._1); val z0 = us.filterNot(_._1)
    val itt = z1.map(_._3).sum / z1.length - z0.map(_._3).sum / z0.length
    val fs = z1.map(_._2).sum / z1.length - z0.map(_._2).sum / z0.length
    val out = graft.queries.CausalDesignQueries.ivWald(spark, sf)
      .collect().head
    assert(out.getLong(0) == us.length.toLong)
    assert(out.getLong(1) == z1.length.toLong)
    assert(math.abs(out.getDouble(2) - itt) < tol)
    assert(math.abs(out.getDouble(3) - fs) < tol)
    assert(math.abs(out.getDouble(4) - itt / fs) < 0.01)
    // the synthetic encouragement must produce a strong first stage
    assert(math.abs(out.getDouble(3)) > 0.1)
  }

  test("q_psm_att reproduces the blocked nearest-score matching") {
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey").agg(expr("sum(round(o_totalprice, 2)) AS y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect().map { r =>
        val key = r.getLong(0)
        // mirror the query's 8dp HALF_UP roundings exactly: an
        // unrounded reference score could flip a near-tie pick
        def r8(x: Double) =
          BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        val ps = r8(1.0 / (1.0 +
          math.exp(-(r8(r.getDouble(3) / 10000.0) - 0.5))))
        (key, r.getInt(1), r.getString(2) == "BUILDING", ps,
          spend.getOrElse(key, 0.0))
      }
    val treated = cust.filter(_._3)
    val controls = cust.filterNot(_._3)
    val diffs = treated.flatMap { case (_, nat, _, tps, ty) =>
      val block = controls.filter(_._2 == nat)
      val lo = block.filter(_._4 <= tps)
        .sortBy(c => (c._4, c._1)).lastOption
      val hi = block.filter(_._4 >= tps)
        .sortBy(c => (-c._4, c._1)).lastOption
      val m = (lo, hi) match {
        case (Some(l), Some(h)) =>
          if (tps - l._4 <= h._4 - tps) Some(l) else Some(h)
        case (Some(l), None) => Some(l)
        case (None, Some(h)) => Some(h)
        case _ => None
      }
      m.map(c => (ty - c._5, math.abs(tps - c._4)))
    }
    val out = CausalDesignQueries.psmAtt(spark, sf).collect().head
    assert(out.getLong(0) == treated.length.toLong)
    assert(out.getLong(1) == diffs.length.toLong)
    val att = diffs.map(_._1).sum / diffs.length
    val gap = diffs.map(_._2).sum / diffs.length
    assert(math.abs(out.getDouble(2) - att) < 0.02, s"att ${out.getDouble(2)} vs $att")
    assert(math.abs(out.getDouble(3) - gap) < tol)
  }
}
