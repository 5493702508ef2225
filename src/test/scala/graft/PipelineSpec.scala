package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries

/** Semantics tests for the event-pipeline analytics module. */
class PipelineSpec extends GraftSpecBase {

  test("q_funnel stages are monotonically non-increasing") {
    val rows = PipelineQueries.funnel(spark, sf).collect()
    assert(rows.length === 3)
    val users = rows.sortBy(_.getString(0)).map(_.getLong(1))
    assert(users(0) >= users(1) && users(1) >= users(2),
      s"funnel must narrow: ${users.mkString(",")}")
    assert(users(0) > 0, "some users must sign up at sf0.001")
  }

  test("q_retention day 0 counts every cohort member") {
    val df = PipelineQueries.retention(spark, sf).cache()
    // every user is active on their own first day -> day_off=0 rows
    // must sum to the distinct-user count
    val day0 = df.filter(col("day_off") === 0)
      .agg(sum("users")).collect()(0).getLong(0)
    val allUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(day0 === allUsers)
    // offsets bounded as filtered
    assert(df.filter(col("day_off") > 7 || col("day_off") < 0).count() === 0)
    df.unpersist()
  }

  test("q_sample_hash is deterministic and samples a strict subset") {
    val a = PipelineQueries.sampleHash(spark, sf).collect()
    val b = PipelineQueries.sampleHash(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "hash sampling must be reproducible")
    val sampled = a.map(_.getLong(1)).sum
    val total = Tables.lineitem(spark, sf).count()
    assert(sampled > 0 && sampled < total,
      s"expected strict subset, got $sampled of $total")
    // 2/16 hex prefixes ~ 12.5% expected; allow wide tolerance
    assert(sampled.toDouble / total > 0.05 &&
      sampled.toDouble / total < 0.25)
  }

  test("q_regr slope matches Spark's built-in regr_slope to 4dp") {
    val ours = PipelineQueries.regr(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 5e-4,
        s"$k: exact-decimal slope $v vs built-in ${builtin(k)}")
    }
  }

  test("q_mode picks the max count with lexicographic tie-break") {
    val rows = PipelineQueries.modeQ(spark, sf).collect()
    val counted = Tables.part(spark, sf)
      .withColumn("tp", split(col("p_type"), " ").getItem(0))
      .groupBy("tp", "p_brand").count().collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val (tp, brand, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
      val grp = counted(tp).map(x => (x.getString(1), x.getLong(2)))
      val maxCnt = grp.map(_._2).max
      assert(cnt === maxCnt)
      assert(brand === grp.filter(_._2 == maxCnt).map(_._1).min,
        s"$tp: tie must break to smallest brand")
    }
  }

  test("q_entropy is bounded by ln(vocabulary size)") {
    val rows = PipelineQueries.entropy(spark, sf).collect()
    rows.foreach { r =>
      val (h, n) = (r.getDouble(1), r.getLong(2))
      assert(h >= 0.0 && h <= math.log(n.toDouble) + 1e-9,
        s"${r.getString(0)}: H=$h outside [0, ln($n)]")
    }
  }

  test("q_seq_adjacent transition counts sum to n_events - n_users") {
    val total = PipelineQueries.seqAdjacent(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val e = Tables.events(spark, sf)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(total === expected,
      "each user's k events yield exactly k-1 transitions")
  }

  test("q_pseudonymize preserves cardinality and total event count") {
    val df = PipelineQueries.pseudonymize(spark, sf).cache()
    val e = Tables.events(spark, sf)
    assert(df.count() === e.select("user_id").distinct().count(),
      "sha2 pseudonyms must not collide at this cardinality")
    assert(df.agg(sum("n_events")).collect()(0).getLong(0) === e.count())
    df.unpersist()
  }

  test("q_join_skew equals the unsalted join") {
    val salted = PipelineQueries.joinSkew(spark, sf).collect()
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Determinism.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
      .orderBy("o_orderstatus").collect()
    assert(salted.toSeq === plain.toSeq,
      "salting must not change join semantics")
  }

  test("q_dedup_latest keeps exactly one newest row per key") {
    val df = PipelineQueries.dedupLatest(spark, sf).cache()
    val pairs = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(df.count() === pairs)
    // the kept ts is the max per pair
    val maxTs = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(max("ts2").as("m"))
    val joined = df.join(maxTs, Seq("user_id", "event_type"))
    assert(joined.filter(col("last_ts") =!= col("m")).count() === 0)
    df.unpersist()
  }
}
