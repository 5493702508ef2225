package graft

import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsExtraQueries, LlmPipeQueries}

/** Semantic invariants of the round-3 corpus-hygiene and analytics
  * operators, checked at sf0.001. Cross-engine value equality is the
  * oracle gate's job (tools/check.sh at all three SFs).
  */
class LlmPipeSpec extends GraftSpecBase {

  test("contamination fraction is in [0,1]; shared never exceeds total") {
    val rows = LlmPipeQueries.contamination(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "shared ≤ total grams")
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("perplexity ≥ 1 and avg_nll ≥ 0 (probabilities ≤ 1)") {
    val rows = LlmPipeQueries.perplexity(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "NLL of p≤1 is ≥ 0")
      assert(r.getDouble(3) >= 1.0 - 1e-9)
    }
  }

  test("repetition: ratios in (0,1], distinct ≤ total, 31-word vocab bound") {
    val rows = LlmPipeQueries.repetition(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(2) <= 31, "closed fixture vocabulary")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("vocab growth: cumulative, ends at the corpus vocabulary size") {
    val rows = LlmPipeQueries.vocabGrowth(spark, sf).collect()
    val sizes = rows.map(_.getLong(2))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b })
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .distinct().count()
    assert(sizes.last == vocab)
    assert(rows.map(_.getLong(1)).sum == vocab)
  }

  test("prefix dedup: every cluster has ≥2 docs and canon = min id") {
    val rows = LlmPipeQueries.dedupPrefix(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      val ids = r.getString(3).split(",").map(_.toLong).toSeq
      assert(ids.length == r.getLong(1))
      assert(ids.min == r.getLong(2), "canonical id is the minimum")
      assert(ids == ids.sorted)
    }
  }

  test("knn: 5 neighbors, query excluded, prediction is a neighbor label") {
    val rows = AnalyticsExtraQueries.knnClassify(spark, sf).collect()
    assert(rows.length == 5)
    assert(!rows.exists(_.getLong(1) == 0L), "query vec excluded")
    val labels = rows.map(_.getInt(2)).toSet
    val pred = rows.head.getInt(5)
    assert(rows.forall(_.getInt(5) == pred), "one prediction, replicated")
    assert(labels.contains(pred))
    // the predicted label has the max vote count
    val byLabel = rows.groupBy(_.getInt(2)).view.mapValues(_.length)
    assert(byLabel(pred) == byLabel.values.max)
  }

  test("histogram2d covers all events exactly once") {
    val rows = AnalyticsExtraQueries.histogram2d(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    assert(math.abs(rows.map(_.getDouble(3)).sum - 100.0) < 0.1)
  }

  test("rolling z-score: first row per user has NULL sigma, |z| bounded") {
    val df = AnalyticsExtraQueries.zscoreRoll(spark, sf)
    // a 1-row frame has no sample variance
    val firsts = df.groupBy("user_id").agg(min("event_id").as("e0"))
    val j = df.join(firsts, df("event_id") === firsts("e0"))
    assert(j.filter(col("sigma").isNotNull).count() == 0)
    // |z| over a 20-row frame can't exceed sqrt(n-1) < 4.36
    assert(df.filter(abs(col("z")) > 4.36).count() == 0)
  }
}
