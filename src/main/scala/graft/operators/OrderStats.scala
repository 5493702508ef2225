package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles WITHOUT a buffering aggregate.
  *
  * Spark's exact `percentile` / `median` aggregates are
  * TypedImperativeAggregates buffering a (value → count) map per
  * group: over a near-unique value column the map holds ~|group| keys
  * on every mapper AND on the one reducer that owns the group — the
  * aggregate-shaped twin of the low-cardinality-partition window
  * funnel (and unlike sum/count, the partial cannot contract). At
  * 100 TB a `median(value) GROUP BY event_type` holds ~n/5 entries in
  * one task's memory.
  *
  * This helper computes the SAME value with every stage parallel and
  * every per-task state bounded by the deployment dial:
  *
  *  1. contract to the `(groups…, value)` grid with exact counts —
  *     a high-cardinality composite shuffle key, partial-aggregable;
  *  2. cumulative counts via the partitioned distributed prefix
  *     ([[PrefixOps.groupedCumCounts]] — parallelism
  *     |groups|·buckets, offsets frame broadcastable);
  *  3. each requested percentile is then two rank lookups
  *     (`min(value) WHERE cum ≥ rank` — an ordinary partial-aggregable
  *     min) plus Spark's own interpolation arithmetic.
  *
  * Value semantics reproduce `org.apache.spark.sql.catalyst.
  * expressions.aggregate.Percentile.getPercentile` exactly: 0-based
  * position `p·(n−1)` computed in double, lower/higher neighbours at
  * `floor`/`ceil`, and the `lower·(higher−pos) + higher·(pos−lower)`
  * interpolation with BOTH short-circuits (`floor==ceil`, and the
  * duplicate-key case where one cell covers both ranks) — so swapping
  * `median(x)`/`percentile(x, p)` for this changes the PLAN, not the
  * value (pinned by the randomized trials in OrderStatsSpec).
  *
  * NULL values are dropped before the grid (matching the SQL
  * aggregates, which skip nulls — and satisfying
  * [[PrefixOps.groupedCumCounts]]'s non-null precondition). One edge
  * remains: a group whose values are ALL null appears with a NULL
  * percentile under Spark's aggregate but VANISHES here (no grid
  * cells survive the filter) — left-join the group spine back if
  * that group set matters.
  */
object OrderStats {

  /** One row per group: `groups…`, `n` (long), and one double column
    * per `(name, p)` in `ps` with the exact interpolated percentile.
    *
    * @param df     input rows (fact-scale; never buffered per group)
    * @param groups grouping column names (low- OR high-cardinality —
    *               every stage is keyed by (groups…, value) or
    *               bucketed, so group cardinality never limits
    *               parallelism)
    * @param value  non-null numeric column name
    * @param ps     (output column name, percentile in [0,1]) pairs
    * @param buckets prefix-pass parallelism per group — the
    *               [[PrefixOps.runningSums]] deployment dial
    */
  def interpolatedPercentiles(df: DataFrame, groups: Seq[String],
      value: String, ps: Seq[(String, Double)],
      buckets: Int = 64): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      s"percentiles must be in [0,1]: $ps")
    val grid = PrefixOps.groupedCumCounts(
      df.select((groups :+ value).map(col): _*)
        .filter(col(value).isNotNull), groups, value, buckets)
    val v = col(value).cast("double")
    // per-percentile rank lookups: position p·(n−1) is 0-based, so
    // rank floor(pos)+1 / ceil(pos)+1 are 1-based; n is constant
    // within a group, so the conditions are group-constant. Also
    // fetch the CUM of the lower-rank cell: when it exceeds the lower
    // rank, the same cell covers the higher rank too, and Spark
    // returns the lower key WITHOUT interpolation — the FP product
    // (hi−pos)·v + (pos−lo)·v is not always bit-identical to v, so
    // the short-circuit must be mirrored, not just the formula.
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      val loRank = floor(pos).cast("long") + 1
      Seq(
        min(when(col("cum") >= loRank, v)).as(s"__os_lo_$name"),
        min(when(col("cum") >= loRank, col("cum"))).as(s"__os_lc_$name"),
        min(when(col("cum") >= ceil(pos).cast("long") + 1, v))
          .as(s"__os_hi_$name"))
    } :+ max(col("n")).as("n")
    val looked = grid.groupBy(groups.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val out = ps.foldLeft(looked) { case (acc, (name, p)) =>
      val pos = lit(p) * (col("n") - 1).cast("double")
      val lo = floor(pos); val hi = ceil(pos)
      acc.withColumn(name,
        when(lo === hi, col(s"__os_lo_$name"))
          .when(col(s"__os_lc_$name") > lo.cast("long") + 1,
            col(s"__os_lo_$name")) // one cell covers both ranks
          .otherwise((hi - pos) * col(s"__os_lo_$name") +
            (pos - lo) * col(s"__os_hi_$name")))
    }
    out.drop(ps.flatMap { case (name, _) =>
      Seq(s"__os_lo_$name", s"__os_lc_$name", s"__os_hi_$name") }: _*)
  }
}
