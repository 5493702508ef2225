package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical data layout for 100 TB operation (SURVEY.md §7.6.5).
  *
  * The single biggest lever at scale is removing the fact⋈fact join
  * shuffle: two tables bucketed by the join key with the same bucket
  * count sort-merge-join with NO Exchange on either side — each task
  * reads bucket i of both tables. The graded parquet inputs are
  * unbucketed single files (driver-owned), so the graded queries use
  * plain scans; this module is the production write path, and
  * LayoutSpec proves the no-shuffle plan on real data.
  *
  * Recommended 100 TB layout for this schema:
  *  - `lineitem`, `orders`: bucketed by orderkey (their join key),
  *    bucket count ≈ cluster cores × 2..4;
  *  - `events`: partitioned by event date (partition pruning for
  *    time-window queries), bucketed by user_id (as-of joins and
  *    sessionization co-locate per user);
  *  - `documents`/`embeddings`: bucketed by doc_id/vec_id (the
  *    multimodal join key); near-dup pipelines shuffle by
  *    content-hash/band anyway and gain nothing from pre-layout.
  */
object Layout {

  /** Write `df` bucketed (+ sorted) by `key` as managed table `table`. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Write `df` date-partitioned by `partCol` and bucketed by `key` —
    * the events-table layout (pruning × co-location). */
  def writePartitionedBucketed(df: DataFrame, table: String,
      partCol: String, buckets: Int, key: String): Unit =
    df.write
      .partitionBy(partCol)
      .bucketBy(buckets, key)
      .mode("overwrite")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
