package graft

/** Every declared query runs at sf0.001 and yields a stable,
  * non-degenerate result (empty is allowed only for threshold
  * queries whose sf0.001 data genuinely has no qualifying pairs). */
class QueriesSmokeSpec extends GraftSpecBase {

  private val mayBeEmpty = Set("q_dedup_ngram", "q_dedup_embed", "q_dedup_minhash")

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o -- q}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
      // (cross-run determinism is the oracle gate's job — tools/check.sh)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
