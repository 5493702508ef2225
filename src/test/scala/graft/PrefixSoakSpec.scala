package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixOps

/** One-off soak (kept cheap enough for CI): 12 extra seeded trials of
  * the NEW partitioned prefix path with randomly drawn shapes — group
  * count, bucket count, null rates, tie density all vary per trial.
  * The permanent OrderStatsSpec trials pin 6 fixed shapes; this suite
  * samples the space more broadly so a rare combination (e.g. every
  * group constant-keyed, or one group all-null values) can't hide. */
class PrefixSoakSpec extends GraftSpecBase {

  test("partitioned runningSums: 12-seed soak across random shapes") {
    import spark.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(1000 + seed)
      val n = 1 + rnd.nextInt(400)
      val buckets = 1 + rnd.nextInt(96)
      val nGroups = 1 + rnd.nextInt(7)
      val tieSpread = math.max(1, n / (1 + rnd.nextInt(8)))
      val nullGroupRate = rnd.nextInt(4) // in 1/12ths
      val nullValRate = rnd.nextInt(5)
      val rows = (1 to n).map { i =>
        (if (rnd.nextInt(12) < nullGroupRate) None
         else Some(s"g${rnd.nextInt(nGroups)}"),
         rnd.nextInt(tieSpread).toDouble,
         if (rnd.nextInt(12) < nullValRate) None
         else Some(rnd.nextInt(2001) - 1000L),
         i.toLong)
      }
      val df = rows.toDF("g", "k", "v", "id")
      val got = PrefixOps.runningSums(df, col("k"),
          Seq(col("k"), col("id")), Seq("rs" -> col("v"), "rn" -> lit(1L)),
          buckets = buckets, partitionBy = Seq(col("g")))
        .select(col("id"), col("rs"), col("rn"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
        .toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("k"), col("id"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val want = df.select(col("id"), sum(col("v")).over(w).as("rs"),
          sum(lit(1L)).over(w).as("rn"))
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
        .toSet
      assert(got == want,
        s"seed=$seed n=$n buckets=$buckets groups=$nGroups tie=$tieSpread")
    }
  }

  test("OrderStats.interpolatedPercentiles: 10-seed soak across random shapes vs the percentile aggregate") {
    import spark.implicits._
    import graft.operators.OrderStats
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(7000 + seed)
      val n = 1 + rnd.nextInt(350)
      val buckets = 1 + rnd.nextInt(96)
      val nGroups = 1 + rnd.nextInt(6)
      val tieSpread = math.max(1, n / (1 + rnd.nextInt(10)))
      val nullValRate = rnd.nextInt(4) // in 1/12ths — aggregate skips
      val p = (rnd.nextInt(1000) + 1) / 1001.0
      val rows = (1 to n).map { _ =>
        (s"g${rnd.nextInt(nGroups)}",
         if (rnd.nextInt(12) < nullValRate) None
         else Some(rnd.nextInt(tieSpread).toDouble))
      }
      val df = rows.toDF("g", "v")
      // keep groups that have at least one non-null value (the
      // all-null-group divergence is documented; the aggregate
      // reference emits NULL there, the grid path drops the group)
      val live = df.filter(col("v").isNotNull).select(col("g")).distinct()
        .collect().map(_.getString(0)).toSet
      val got = OrderStats.interpolatedPercentiles(df, Seq("g"), "v",
          Seq("p50" -> 0.5, "pr" -> p), buckets)
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(r.fieldIndex("p50")), r.getDouble(r.fieldIndex("pr")))))
        .toMap
      val want = df.filter(col("v").isNotNull).groupBy(col("g"))
        .agg(percentile(col("v"), lit(0.5)).as("p50"),
          percentile(col("v"), lit(p)).as("pr"))
        .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
        .toMap
      assert(got.keySet == live && got == want,
        s"seed=$seed n=$n buckets=$buckets groups=$nGroups p=$p")
    }
  }
}
