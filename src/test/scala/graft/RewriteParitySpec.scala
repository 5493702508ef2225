package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{GrowthAcctQueries, InfoStatsQueries}

/** Parity pins for the round-7 SEMANTIC rewrites — the two census
  * fixes that changed operators, not just materialization points:
  * bigrams by array shift (vs the positional self-join) and growth
  * accounting by per-user window adjacency (vs the three
  * self-joins). The driver's oracle proves them on the fixture; these
  * fixtures drive the shapes the fixture data never shows: empty
  * text, single tokens, repeated separators, single-day users,
  * multi-day gaps, resurrections, same-day re-activity, last-day
  * churn. */
class RewriteParitySpec extends GraftSpecBase {

  // ----- bigrams: array shift ≡ positional self-join ---------------

  private def bigramsJoinForm(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
    toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") === col("a.pos") + 1)
      .select(col("a.doc_id").as("doc_id"), col("a.tok").as("w1"),
        col("b.tok").as("w2"))
  }

  test("array-shift bigrams equal the positional-join bigrams on nasty token shapes") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "single"),
      (3L, ""),
      (4L, "a  b"),          // empty token from the double separator
      (5L, "x x x x x"),     // repeated bigrams
      (6L, "MiXeD CaSe mixed case"),
      (7L, " leading and trailing "),
      (8L, "a b a b a")      // repeated non-adjacent structure
    ).toDF("doc_id", "text")
    val shift = InfoStatsQueries.bigramsOf(docs)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    val join = bigramsJoinForm(docs)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(shift == join)
  }

  // ----- growth accounting: window adjacency ≡ three self-joins ----

  private def growthJoinForm(act: DataFrame): DataFrame = {
    val first = act.groupBy(col("u")).agg(min(col("day")).as("fday"))
    val yday = act.select(col("u"), date_add(col("day"), 1).as("day"),
      lit(1L).as("was_active"))
    val classed = act.join(first, "u")
      .join(yday, Seq("u", "day"), "left")
      .select(col("u"), col("day"),
        when(col("day") === col("fday"), "new")
          .when(col("was_active").isNotNull, "retained")
          .otherwise("resurrected").as("cls"))
    val dau = classed.groupBy(col("day")).agg(
      count(lit(1)).as("dau"),
      count(when(col("cls") === "new", lit(1))).as("new_u"),
      count(when(col("cls") === "retained", lit(1))).as("retained_u"),
      count(when(col("cls") === "resurrected", lit(1))).as("resurrected_u"))
    val churned = act.select(col("u"), date_add(col("day"), 1).as("day"))
      .join(act.select(col("u"), col("day"), lit(1L).as("still")),
        Seq("u", "day"), "left")
      .filter(col("still").isNull)
      .groupBy(col("day")).agg(count(lit(1)).as("churned_u"))
    dau.join(churned, Seq("day"), "left")
      .select(col("day"), col("dau"), col("new_u"), col("retained_u"),
        col("resurrected_u"),
        coalesce(col("churned_u"), lit(0L)).as("churned_u"),
        (col("dau") === col("new_u") + col("retained_u")
          + col("resurrected_u")).as("identity_ok"))
      .orderBy(col("day").desc)
      .limit(10)
  }

  private def rows(df: DataFrame) =
    df.collect().toSeq.map(r => (r.getDate(0).toString, r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getBoolean(6)))

  private def checkGrowth(activity: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    val act = activity.toDF("u", "d")
      .select(col("u"), to_date(col("d")).as("day")).distinct()
    assert(rows(GrowthAcctQueries.growthFrom(act))
      == rows(growthJoinForm(act)))
  }

  test("window-form growth accounting equals the self-join form on gap/resurrection shapes") {
    checkGrowth(Seq(
      (1L, "2026-01-01"), (1L, "2026-01-02"), (1L, "2026-01-05"), // gap → resurrected
      (2L, "2026-01-02"),                                         // single-day user
      (3L, "2026-01-01"), (3L, "2026-01-02"), (3L, "2026-01-03"), // fully retained
      (4L, "2026-01-05"),                                         // late joiner
      (5L, "2026-01-01"), (5L, "2026-01-03"), (5L, "2026-01-05")  // alternating
    ))
  }

  test("window-form growth accounting equals the self-join form on seeded random activity") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val act = for {
        u <- 1L to 40L
        d <- 1 to 20
        if rnd.nextDouble() < 0.3
      } yield (u, f"2026-02-$d%02d")
      checkGrowth(act)
    }
  }

  // ----- round-8 margins-from-the-grid identity ---------------------
  // The scan-census wave rewrote q_t_closeness / q_mutual_info /
  // q_macro_f1 / q_logrank / q_assoc_rules to derive margins, grand
  // totals, and group spines as FOLDS OF THE ONE (key…, count) grid
  // instead of separate passes over the base rows. The identity is
  // that a grid partitions the input (every row lands in exactly one
  // cell, including NULL-keyed rows), so summing disjoint cell counts
  // per margin key equals counting the base rows per margin key, and
  // the grid's distinct key values equal the base's. The driver's
  // oracle proves the five queries on the fixture; this pins the
  // identity itself on the shapes the fixture never shows: NULL keys
  // on either axis, a both-NULL row, a single-row group, an empty
  // frame, and a key present on only one axis.

  private def marginParity(base: DataFrame): Unit = {
    val grid = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    def rows(df: DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // margin per a: fold of grid == direct pass (NULL-safe groupBy)
    assert(rows(grid.groupBy(col("a")).agg(sum(col("c")).as("n")))
      == rows(base.groupBy(col("a")).agg(count(lit(1)).as("n"))))
    // margin per b
    assert(rows(grid.groupBy(col("b")).agg(sum(col("c")).as("n")))
      == rows(base.groupBy(col("b")).agg(count(lit(1)).as("n"))))
    // grand total (sum of LONG counts keeps the LONG type the rewrites
    // rely on for the driver's hash compare)
    assert(rows(grid.agg(coalesce(sum(col("c")), lit(0L)).as("n")))
      == rows(base.agg(count(lit(1)).as("n"))))
    // key spine: distinct a of the grid == distinct a of the base
    // (the q_macro_f1 classes rewrite)
    assert(rows(grid.select(col("a")).distinct())
      == rows(base.select(col("a")).distinct()))
  }

  test("margins-from-grid equals direct margins on NULL-keyed, empty, and singleton shapes") {
    val s = spark
    import s.implicits._
    val nasty = Seq[(Option[String], Option[Int])](
      (Some("x"), Some(1)), (Some("x"), Some(1)), (Some("x"), Some(2)),
      (Some("y"), None),                       // NULL on one axis
      (None, Some(1)), (None, Some(1)),        // NULL on the other
      (None, None),                            // both NULL
      (Some("z"), Some(9))                     // singleton group
    ).toDF("a", "b")
    marginParity(nasty)
    marginParity(nasty.limit(0))               // empty frame
    marginParity(nasty.filter(col("a").isNull)) // all-NULL key axis
  }

  test("margins-from-grid parity on seeded random grids") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val base = (1 to 300).map { _ =>
        (if (rnd.nextDouble() < 0.1) None else Some(s"k${rnd.nextInt(5)}"),
         if (rnd.nextDouble() < 0.1) None else Some(rnd.nextInt(4)))
      }.toDF("a", "b")
      marginParity(base)
    }
  }
}
