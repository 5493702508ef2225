package graft.functions

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100 TB-scale near-duplicate detection via MLlib MinHashLSH
  * (SURVEY.md §2-B "MinHash-LSH near-dup" ✗ capability row; the
  * oracle-graded SQL variant is q_dedup_minhash).
  *
  * Pipeline: tokenize → CountVectorizer (token→index, binary) →
  * MinHashLSH signatures → approxSimilarityJoin, which internally
  * explodes signatures into LSH bands and equi-joins on band buckets:
  * candidate generation is O(Σ bucket²), never O(n²) over the corpus.
  * Property-tested against the exact token-Jaccard pairs
  * (LshDedupSpec): LSH pairs at distance ≤ d must contain every
  * exact pair with Jaccard ≥ 1-d minus the probabilistic miss rate.
  *
  * Scale notes: signatures are a fixed-width column (numHashTables ×
  * 1 double), so the shuffle carries hashes, not documents; skewed
  * buckets (stop-token-like shingles) are the one hazard — cap bucket
  * size or salt the vocabulary in production.
  */
object MinHashDedup {

  /** @return (doc_a, doc_b, jaccard_distance) candidate pairs with
    *         approx Jaccard distance ≤ maxDistance. */
  def nearDuplicates(spark: SparkSession, docs: DataFrame,
      maxDistance: Double = 0.2, numHashTables: Int = 8): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      split(lower(col("text")), " ").as("tokens"))
    val cv = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("tf").setBinary(true)
      .fit(tokens)
    val vecs = cv.transform(tokens)
      // MinHashLSH requires ≥1 non-zero entry
      .filter(udf((v: SparseVector) => v.numNonzeros > 0).apply(col("tf")))
    val lsh = new MinHashLSH()
      .setInputCol("tf").setOutputCol("sig")
      .setNumHashTables(numHashTables)
      .setSeed(42L)
      .fit(vecs)
    lsh.approxSimilarityJoin(vecs, vecs, maxDistance, "dist")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"), col("dist"))
      .filter(col("doc_a") < col("doc_b"))
  }
}
