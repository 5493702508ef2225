package graft

import org.apache.spark.sql.functions._
import graft.queries._

/** Property-style invariants (SURVEY.md §5.2.3) over the graded
  * operators, checked on real sf0.001 data. */
class PropertySpec extends GraftSpecBase {

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val once = TextQueries.dedupExact(spark, sf)
    assert(once.count() === once.distinct().count())
    // keep-min semantics: every keep_id is a real doc_id and minimal
    val keeps = once.select("keep_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
    assert(keeps.distinct().count() === once.count())
  }

  test("union-all counts are additive; union-distinct bounded") {
    val a = SortSetQueries.unionAll(spark, sf).count()
    val d = SortSetQueries.unionDistinct(spark, sf).count()
    assert(d <= a)
  }

  test("bag set-ops respect multiplicity algebra") {
    val o = Tables.orders(spark, sf)
    def cnts(status: String) = o.filter(col("o_orderstatus") === status)
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = cnts("F"); val oo = cnts("O"); val p = cnts("P")
    val ia = SortSetQueries.intersectAllQ(spark, sf).count()
    assert(ia === f.keysIterator.map(k => math.min(f(k), oo.getOrElse(k, 0L))).sum,
      "INTERSECT ALL = sum of per-key min multiplicities")
    val ea = SortSetQueries.exceptAllQ(spark, sf).count()
    assert(ea === f.keysIterator.map(k => math.max(f(k) - p.getOrElse(k, 0L), 0L)).sum,
      "EXCEPT ALL = sum of per-key left-minus-right floored at 0")
  }

  test("cosine similarities are bounded in [-1, 1]") {
    val rows = SimQueries.simPairs(spark, sf)
      .select("cos_sim").collect().map(_.getDouble(0))
    assert(rows.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("jaccard scores are bounded in (0, 1]") {
    val rows = TextQueries.textJaccard(spark, sf)
      .select("jaccard").collect().map(_.getDouble(0))
    assert(rows.forall(j => j > 0.0 && j <= 1.0))
  }

  test("window running sum ends at the group total") {
    val win = WindowQueries.winRunning(spark, sf)
    val last = win.groupBy("o_custkey")
      .agg(max("running_total").as("final_total"))
    val grp = graft.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(graft.Determinism.dsum(col("o_totalprice")).as("sum_total"))
    val joined = last.join(grp, "o_custkey")
      .filter(col("final_total") =!= col("sum_total"))
    assert(joined.count() === 0)
  }

  test("approx_count_distinct within 5% of exact (ungraded HLL row)") {
    val e = graft.Tables.events(spark, sf)
    val exact = e.select(countDistinct(col("user_id"))).first().getLong(0)
    val approx = e.select(approx_count_distinct(col("user_id"))).first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }

  test("LSH candidate pairs ⊇ high-Jaccard exact pairs (recall property)") {
    val docs = graft.Tables.documents(spark, sf)
    val lsh = graft.functions.MinHashDedup
      .nearDuplicates(spark, docs, maxDistance = 0.5, numHashTables = 12)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact pairs with Jaccard ≥ 0.9 (distance ≤ 0.1 ≪ 0.5 cut)
    val tok = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("t")).distinct()
    val sz = tok.groupBy("doc_id").count()
    val exact = tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .agg(count(lit(1)).as("i"))
      .join(sz.select(col("doc_id").as("x"), col("count").as("sx")), "x")
      .join(sz.select(col("doc_id").as("y"), col("count").as("sy")), "y")
      .filter(col("i") / (col("sx") + col("sy") - col("i")) >= 0.9)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(lsh),
      s"missed ${(exact -- lsh).size} of ${exact.size} high-Jaccard pairs")
  }

  test("ANN LSH top-k ranks ⊆ brute-force ranks (pruning, not corruption)") {
    val e = graft.Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0).toArray
    val brute = graft.functions.Ann.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select("vec_id", "cos_sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = graft.functions.Ann.lshTopK(e, "vec_id", "embedding", q, 10,
      bits = 4, probes = 2).select("vec_id", "cos_sim").collect()
    assert(lsh.nonEmpty)
    // every LSH hit's score matches the exact kernel (same candidates,
    // same math — LSH only prunes)
    lsh.foreach { r =>
      brute.get(r.getLong(0)).foreach(b => assert(math.abs(b - r.getDouble(1)) < 1e-12))
    }
    // the query's own vector is always in its own bucket → rank 1
    assert(lsh.head.getLong(0) === 0L)
  }

  test("minhash estimate tracks exact jaccard within K=16 sketch error") {
    val rows = DedupQueries.minhashEst(spark, sf)
      .select("est_jaccard", "exact_jaccard").collect()
    assert(rows.nonEmpty)
    val errs = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    // per-pair: binomial(16, j) stderr ≤ 0.125; 3.5 sigma bound
    assert(errs.max < 0.45, s"max error ${errs.max}")
    // in aggregate the estimator is unbiased
    assert(errs.sum / errs.length < 0.15,
      s"mean error ${errs.sum / errs.length}")
  }

  test("approx quantiles land within 5% of exact percentiles") {
    val approx = CapabilityQueries.approxQuantile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (k, (a50, a90)) =>
      val (e50, e90) = exact(k)
      assert(math.abs(a50 - e50) / e50 < 0.05, s"$k p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"$k p90: $a90 vs $e90")
    }
  }

  test("bloom pre-filter admits a superset of the exact semi-join") {
    val exact = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val probed = CapabilityQueries.bloomFilter(spark, sf).collect()(0)
    val (nProbe, nKeys) = (probed.getLong(0), probed.getLong(1))
    // no false negatives: every true match passes the filter
    assert(nProbe >= exact.count())
    // fpp=1% over ~1500 candidate keys: the superset is tight
    val exactKeys = exact.select("l_orderkey").distinct().count()
    assert(nKeys >= exactKeys && nKeys <= exactKeys + 100,
      s"expected tight superset: bloom=$nKeys exact=$exactKeys")
  }
}
