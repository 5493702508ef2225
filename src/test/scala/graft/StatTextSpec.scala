package graft

import org.apache.spark.sql.functions._
import graft.queries.{CleanTextQueries, StatEngQueries}

/** Invariants for the round-4 corpus-cleaning and stat-engineering
  * families (sf0.001): softmax is a probability distribution,
  * Kaplan–Meier is monotone, snapshot diff partitions the users,
  * readability/boilerplate ratios are bounded.
  */
class StatTextSpec extends GraftSpecBase {

  test("readability: ratios bounded, syllable groups <= non-space chars") {
    CleanTextQueries.readability(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "vowel groups <= chars")
      assert(r.getDouble(4) > 0)
      val lr = r.getDouble(5)
      assert(lr >= 0.0 && lr <= 1.0)
    }
  }

  test("boilerplate: ratio bounded and high-df shingles exist at this sf") {
    val rows = CleanTextQueries.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val br = r.getDouble(3)
      assert(br >= 0.0 && br <= 1.0)
    }
  }

  test("softmax weights form a probability distribution per type") {
    val rows = StatEngQueries.softmax(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val total = g.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4, s"weights sum to 1 (got $total)")
      // a user far below the per-type max rounds to 0 at 8dp — that is
      // the point of max-subtraction (no overflow, graceful underflow)
      g.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    }
  }

  test("kaplan-meier survival is non-increasing and at-risk counts shrink") {
    val rows = StatEngQueries.survival(spark, sf)
      .orderBy(col("t"), col("dur")).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDouble(6) <= a.getDouble(6) + 1e-9,
            "survival curve is monotone non-increasing")
          assert(b.getLong(5) < a.getLong(5),
            "at-risk count strictly shrinks along durations")
        case _ =>
      }
      assert(sorted.head.getDouble(6) <= 1.0 + 1e-9)
      assert(sorted.last.getDouble(6) >= 0.0)
    }
  }

  test("snapshot diff partitions users and classifies consistently") {
    val rows = StatEngQueries.snapshotDiff(spark, sf).collect()
    val users = Tables.events(spark, sf).select(col("user_id"))
      .distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      val ct = r.getString(r.fieldIndex("change_type"))
      val oldNull = r.isNullAt(r.fieldIndex("old_n"))
      val newNull = r.isNullAt(r.fieldIndex("new_n"))
      ct match {
        case "added"   => assert(oldNull && !newNull)
        case "removed" => assert(!oldNull && newNull)
        case _         => assert(!oldNull && !newNull)
      }
    }
  }
}
