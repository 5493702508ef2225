package graft

import org.apache.spark.sql.functions._
import graft.queries.SeqEconQueries

/** Invariants for the round-4 sequence/econ/text-distribution family
  * (sf0.001). */
class SeqEconSpec extends GraftSpecBase {

  test("trigram shares sum to 1 and counts tie to the sequence length") {
    val rows = SeqEconQueries.seqTrigram(spark, sf).collect()
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    val total = rows.map(_.getLong(3)).sum
    // each user with k >= 3 events contributes k-2 trigrams
    val expected = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => math.max(r.getLong(1) - 2, 0L)).sum
    assert(total == expected)
  }

  test("elasticity is finite for every brand") {
    SeqEconQueries.elasticity(spark, sf).collect().foreach { r =>
      val e = r.getDouble(2)
      assert(!e.isNaN && !e.isInfinite)
    }
  }

  test("xyz classes follow the cv thresholds and cover every part") {
    val rows = SeqEconQueries.xyzClass(spark, sf).collect()
    val parts = Tables.lineitem(spark, sf).select(col("l_partkey"))
      .distinct().count()
    assert(rows.length == parts)
    rows.foreach { r =>
      val (cv, cls) = (r.getDouble(3), r.getString(4))
      assert(cv >= 0.0)
      val want = if (cv < 0.25) "X" else if (cv < 0.5) "Y" else "Z"
      assert(cls == want)
    }
  }

  test("frequency-of-frequencies: sum of r * N_r equals the token count") {
    val rows = SeqEconQueries.freqOfFreq(spark, sf).collect()
    val mass = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " "))).count()
    assert(mass == tokens, "the frequency table accounts for every token")
  }

  test("burstiness: only tokens in >= 5 docs, vmr >= 0, mean >= 1") {
    SeqEconQueries.burstiness(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) >= 5)
      assert(r.getDouble(2) >= 1.0, "mean per containing doc is at least 1")
      assert(r.getDouble(4) >= 0.0)
    }
  }
}
