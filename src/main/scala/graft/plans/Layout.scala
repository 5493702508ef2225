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

  /** Bucket keys for the graded fixtures — facts carry their dominant
    * join key (the scaladoc recommendation above, as data); dims
    * (region, nation) stay plain catalog tables. */
  val gradedBucketKeys: Map[String, String] = Map(
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "user_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Materialize ALL graded fixtures from `sfDir` through the
    * production layout into the session catalog as
    * `<prefix>_<table>` — the write path behind Verify's
    * `SPARK_GRAFT_LAYOUT` dial (round-11, verdict item 1: run the
    * WHOLE graded surface over the storage layout it would read at
    * 100 TB, not just LayoutGradedSpec's 5-query subset).
    *
    * `events` goes through the decode (ts2/ts_nanos) and is written
    * via [[writePartitionedBucketed]]: date-partitioned (partition
    * pruning for time-window queries) AND bucketed by user_id (as-of
    * joins / sessionization co-locate per user). The derived
    * `event_date` partition column is layout-only — [[graft.Tables]]
    * drops it on catalog reads so query schemas are identical to the
    * parquet run. Everything else follows [[gradedBucketKeys]].
    */
  def writeGradedCatalog(spark: SparkSession, sfDir: String,
      prefix: String, buckets: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, to_date}
    graft.Tables.names.foreach { name =>
      val t = s"${prefix}_$name"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      if (name == "events") {
        val ev = graft.Tables.events(spark, sfDir)
          .withColumn("event_date", to_date(col("ts2")))
        writePartitionedBucketed(ev, t, "event_date", buckets, "user_id")
        // record the derivation invariant (+ the timezone to_date
        // truncated in) so [[DerivedPartitionPruning]] can imply
        // event_date predicates from literal ts2 predicates — the
        // layout-only partition column is invisible to queries, and
        // without this metadata a ts2 range filter prunes nothing
        // (round-12, verdict item 6)
        val tz = spark.sessionState.conf.sessionLocalTimeZone
        spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES(" +
          s"'${DerivedPartitionPruning.PropKey}'=" +
          s"'event_date=to_date(ts2):$tz')")
        ()
      } else {
        val df = graft.Tables.table(spark, sfDir, name)
        gradedBucketKeys.get(name) match {
          case Some(k) => writeBucketed(df, t, buckets, k)
          case None => df.write.mode("overwrite").saveAsTable(t)
        }
      }
    }
  }

  /** Recursive delete of a SELF-CREATED scratch directory (run-private
    * warehouses, checkpoint temp dirs, orphaned test tables). Does NOT
    * follow symlinks out of the tree — a link inside the directory is
    * removed, its target untouched. The single shared implementation
    * (round-11 review: Verify, Explain and the test base each carried
    * their own copy, and only one had the symlink guard). */
  def deleteTree(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (!java.nio.file.Files.isSymbolicLink(f.toPath))
        Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(dir))
  }
}
