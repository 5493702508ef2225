package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing tests: binary columns round-trip, partition-
  * local decode, deterministic features, generator-style frame
  * sampling (no real codecs in the container — FakeCodec stands in,
  * the Spark-side shapes are real). */
class MultimodalSpec extends GraftSpecBase {
  import spark.implicits._

  private lazy val corpus = Multimodal.syntheticCorpus(spark, 99).cache()

  test("synthetic corpus covers all modalities with binary payloads") {
    val byMod = corpus.groupByKey(_.modality).count().collect().toMap
    assert(byMod.keySet === Set("image", "audio", "video"))
    assert(corpus.collect().forall(_.bytes.nonEmpty))
  }

  test("feature extraction is partition-local, typed, fixed-dim, normalized") {
    val f = extractFeatures(corpus).collect()
    assert(f.length === 99)
    assert(f.forall(_.features.length === FakeCodec.FeatureDim))
    // L1-normalized histogram sums to ~1
    assert(f.forall(r => math.abs(r.features.map(_.toDouble).sum - 1.0) < 1e-5))
  }

  test("features are deterministic across repartitioning") {
    val a = extractFeatures(corpus).collect().map(r => r.mediaId -> r.checksum).toMap
    val b = extractFeatures(corpus.repartition(7)).collect()
      .map(r => r.mediaId -> r.checksum).toMap
    assert(a === b)
  }

  test("resize preserves ids and sets target dims") {
    val r = resizeAll(corpus.filter(_.modality == "image"), 8, 8).collect()
    assert(r.forall(x => x.width === 8 && x.height === 8))
    assert(r.forall(_.bytes.length <= 64))
  }

  test("frame sampling explodes videos into pseudo-frames") {
    val vids = corpus.filter(_.modality == "video")
    val frames = sampleFrames(vids, everyMs = 1000)
    val perVid = frames.groupByKey(_.mediaId / FakeCodec.MaxFrames)
      .count().collect().toMap
    val expected = vids.collect().map(v =>
      v.mediaId -> math.max(1, (v.durationMs / 1000).toInt).toLong).toMap
    assert(perVid === expected)
    assert(frames.collect().forall(_.modality == "image"))
  }

  test("end-to-end flow: decode → features → sign-LSH dedup, deterministic expected clusters (round-9, verdict item 7)") { graft.operators.CacheOps.scoped {
    // byte-identical copies under new ids: identical payload →
    // identical FakeCodec features → identical sign-LSH bucket →
    // one cluster with the ORIGINAL as representative
    val base = Multimodal.syntheticCorpus(spark, 30)
    val copies = base.filter(_.mediaId % 10 == 0)
      .map(r => r.copy(mediaId = r.mediaId + 1000))
    val out = Multimodal.lshDedup(base.union(copies), bits = 12)
    val rows = out.collect()
    assert(rows.length === 33)
    val rep = rows.map(r =>
      r.getAs[Long]("mediaId") -> r.getAs[Long]("representative")).toMap
    // every copy clusters with its original (same bucket by construction)
    Seq(0L, 10L, 20L).foreach { id =>
      assert(rep(id + 1000) === rep(id),
        s"copy of $id must share its original's cluster") }
    // the deterministic expected cluster: 0 is the global min id, so
    // its bucket's representative IS 0, and the copy is non-canonical
    assert(rep(1000L) === 0L)
    val canon = rows.map(r =>
      r.getAs[Long]("mediaId") -> r.getAs[Boolean]("is_canonical")).toMap
    assert(canon(0L) && !canon(1000L))
    // the corpus does not collapse into one bucket (the dedup is a
    // clustering, not a constant)
    assert(rows.map(_.getAs[Long]("bucket")).distinct.length > 5)
    // partition-layout determinism: the whole chain (decode included)
    // gives the same clusters after a repartition
    val rep2 = Multimodal.lshDedup(
      base.union(copies).repartition(7), bits = 12).collect()
      .map(r => r.getAs[Long]("mediaId") -> r.getAs[Long]("representative"))
      .toMap
    assert(rep2 === rep)
  } }

  test("extracted features feed the similarity kernel (compose with ANN)") {
    val feats = extractFeatures(corpus)
      .select($"mediaId".as("vec_id"), $"features".as("embedding"))
    val q = extractFeatures(corpus).filter(_.mediaId == 0L)
      .collect().head.features
    val top = graft.functions.Ann.bruteForceTopK(feats.toDF(), "vec_id", "embedding", q, 5)
    val rows = top.collect()
    assert(rows.length === 5)
    assert(rows.head.getLong(0) === 0L) // self is nearest
  }
}
