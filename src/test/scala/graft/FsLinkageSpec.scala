package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.FsLinkageQueries

/** Pins the q_fs_linkage grid pipeline — in particular the round-7
  * 11-smallest-members-per-cell cap on tier enumeration — against the
  * brute-force pairwise reference on synthetic fixtures with LARGE
  * cells. The graded fixture's cells are mostly singletons, so the
  * driver's oracle alone never exercises the cap's drop path; these
  * fixtures force cells far past 11 members and randomized shapes.
  *
  * Exactness claim under test: within a weight tier pairs rank by
  * (c1, c2); a pair with an endpoint beyond its cell's 11th-smallest
  * custkey is preceded by ≥ 10 same-tier pairs, so the capped
  * enumeration's top-10 equals the uncapped top-10; with < 10 pairs
  * globally every cell has ≤ 4 members and nothing is dropped.
  */
class FsLinkageSpec extends GraftSpecBase {

  /** Constant weight row with the agree/disagree spread the real
    * query produces (agree > 0 > disagree, distinct per field). */
  private def weights: DataFrame = {
    val s = spark
    import s.implicits._
    Seq((2.0, -1.0, 1.5, -0.5, 1.0, -0.25))
      .toDF("wa_seg", "wd_seg", "wa_bal", "wd_bal", "wa_dig", "wd_dig")
  }

  /** Brute-force pairwise reference: every same-nation pair, the
    * SAME rounded scoring expressions, the same order and limit. */
  private def brute(cust: DataFrame, w: DataFrame): DataFrame = {
    val a = cust.select(col("ck").as("ka"), col("nk").as("nka"),
      col("seg").as("sega"), col("bal").as("bala"), col("dig").as("diga"))
    val b = cust.select(col("ck").as("kb"), col("nk").as("nkb"),
      col("seg").as("segb"), col("bal").as("balb"), col("dig").as("digb"))
    a.join(b, col("nka") === col("nkb") && col("ka") < col("kb"))
      .crossJoin(broadcast(w))
      .select(col("ka").as("c1"), col("kb").as("c2"),
        (when(col("sega") === col("segb"), 1).otherwise(0)
          + when(col("bala") === col("balb"), 1).otherwise(0)
          + when(col("diga") === col("digb"), 1).otherwise(0))
          .as("n_agree"),
        round(when(col("sega") === col("segb"), col("wa_seg"))
            .otherwise(col("wd_seg"))
          + when(col("bala") === col("balb"), col("wa_bal"))
            .otherwise(col("wd_bal"))
          + when(col("diga") === col("digb"), col("wa_dig"))
            .otherwise(col("wd_dig")), 6)
          .as("w_total"))
      .orderBy(col("w_total").desc, col("c1"), col("c2"))
      .limit(10)
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Int, Double)] =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))

  private def check(cust: DataFrame): Unit = {
    val w = weights
    assert(rows(FsLinkageQueries.fsTop10(cust, w)) == rows(brute(cust, w)))
  }

  private def custDF(t: Seq[(Long, Int, String, Int, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    t.toDF("ck", "nk", "seg", "bal", "dig")
  }

  test("a 15-member cell (cap must drop members 12..15) matches the pairwise reference") {
    val big = (1L to 15L).map(k => (k, 0, "A", 1, "x"))
    val rest = Seq(
      (100L, 0, "A", 1, "y"), (101L, 0, "A", 2, "x"), (102L, 0, "B", 1, "x"),
      (200L, 1, "A", 1, "x"), (201L, 1, "A", 1, "x"), (202L, 1, "B", 2, "y"))
    check(custDF(big ++ rest))
  }

  test("fewer than 10 pairs globally: every pair is returned") {
    val t = Seq(
      (1L, 0, "A", 1, "x"), (2L, 0, "B", 2, "y"), (3L, 0, "A", 2, "x"),
      (10L, 1, "A", 1, "x"), (11L, 1, "B", 1, "z"))
    val out = rows(FsLinkageQueries.fsTop10(custDF(t), weights))
    assert(out == rows(brute(custDF(t), weights)))
    assert(out.size == 4, "3 nation-0 pairs + 1 nation-1 pair")
  }

  test("one-nation deep cells: the 100 TB shape, where the threshold tier is all-agree") {
    // every customer in ONE nation, 4 coarse cells of ~100 members —
    // the all-agree tier alone holds thousands of pairs, so only the
    // m=7 branch enumerates (the other 7 gate to empty), and the
    // 11-member cap drops ~90% of each cell
    val t = (1L to 400L).map(k =>
      (k * 7 % 1000 * 1000 + k, 0, if (k % 2 == 0) "A" else "B",
        (k % 2).toInt, "x"))
    val uniq = t.groupBy(_._1).map(_._2.head).toSeq
    check(custDF(uniq))
  }

  test("patterns tying on w_total merge into one tier (the byW group-by path)") {
    // wa_seg = wa_bal and wd_seg = wd_bal make the {seg} and {bal}
    // agreement patterns produce the IDENTICAL w_total, so the
    // threshold tier spans two patterns — the default fixture weights
    // keep all 8 pattern sums distinct and never exercise this merge
    val s = spark
    import s.implicits._
    val w = Seq((1.0, -0.5, 1.0, -0.5, 0.25, -0.125))
      .toDF("wa_seg", "wd_seg", "wa_bal", "wd_bal", "wa_dig", "wd_dig")
    val t = (1L to 30L).map(k =>
      (k, (k % 2).toInt, if (k % 3 == 0) "A" else "B",
        (k % 4).toInt, if (k % 5 == 0) "x" else "y"))
    assert(rows(FsLinkageQueries.fsTop10(custDF(t), w))
      == rows(brute(custDF(t), w)))
  }

  test("seeded random shapes match the pairwise reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // 8 possible cells over up-to-100 rows → average cell size ~12,
      // so the >11-member drop path runs in most trials
      val n = 30 + rnd.nextInt(70)
      val t = (1 to n).map { i =>
        (rnd.nextInt(100000).toLong * 5 + i, rnd.nextInt(2),
          "A", rnd.nextInt(2),
          if (rnd.nextBoolean()) "x" else "y")
      }
      // unique keys: the generator above can collide across i — dedup
      val uniq = t.groupBy(_._1).map(_._2.head).toSeq
      check(custDF(uniq))
    }
  }
}
