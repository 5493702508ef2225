package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache hygiene for query builders that persist an intermediate
  * (iterative graph algorithms, pair-generation barriers): persisted
  * blocks otherwise accumulate in executor storage memory across a
  * multi-hundred-query bench run (round-3 advice).
  *
  * [[finalized]] materializes the (small — these results are
  * dimension-sized) result with an EAGER `localCheckpoint`, which cuts
  * the lineage back to the persisted intermediate, then unpersists the
  * intermediates. The caller gets a self-contained DataFrame; the
  * cache's storage is released immediately instead of at session end.
  */
object CacheOps {
  def finalized(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint() // eager: runs the query now
    cached.foreach(_.unpersist())
    out
  }
}
