package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinPlan

/** The custom as-of join operator (LogicalPlan + Strategy + Exec):
  * result equivalence against the compositional join+max(struct)
  * form, left-outer semantics, and the physical-plan shape (merge
  * scan, no pair materialization). */
class AsOfJoinSpec extends GraftSpecBase {

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
      col("ts2").as("p_ts"))

  private def signups = Tables.events(spark, sf)
    .filter(col("event_type") === "signup")
    .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
      col("ts2").as("s_ts"))

  private def asofDf = {
    GraftExtensions.register(spark)
    AsOfJoinPlan.asof(purchases, signups,
      leftKeys = Seq(col("p_user")), rightKeys = Seq(col("s_user")),
      leftTime = col("p_ts"), rightTime = col("s_ts"),
      rightTie = Seq(col("s_id")))
  }

  test("as-of exec matches the join+max(struct) compositional form") {
    val viaExec = asofDf
      .filter(col("s_id").isNotNull)
      .select(col("p_id"), col("s_ts"), col("s_id"))
    val viaAgg = purchases
      .join(signups, col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts"))
      .groupBy(col("p_id"))
      .agg(max(struct(col("s_ts"), col("s_id"))).as("m"))
      .select(col("p_id"), col("m.s_ts").as("s_ts"), col("m.s_id").as("s_id"))
    assert(viaExec.count() > 0)
    assert(viaExec.except(viaAgg).count() === 0)
    assert(viaAgg.except(viaExec).count() === 0)
  }

  test("as-of exec is left-outer: every left row appears exactly once") {
    val out = asofDf
    assert(out.count() === purchases.count())
    assert(out.groupBy("p_id").count().filter(col("count") > 1).count() === 0)
  }

  test("as-of plan is a co-partitioned merge scan, no pair blow-up") {
    GraftExtensions.register(spark)
    // round-robin inputs do NOT satisfy the key distribution →
    // EnsureRequirements must insert one hash exchange per side
    val out = AsOfJoinPlan.asof(purchases.repartition(4), signups.repartition(4),
      leftKeys = Seq(col("p_user")), rightKeys = Seq(col("s_user")),
      leftTime = col("p_ts"), rightTime = col("s_ts"),
      rightTie = Seq(col("s_id")))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p.take(3000)) // the exec node
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
    assert(p.linesIterator.count(_.trim.contains("Exchange hashpartitioning")) === 2,
      p.take(3000))
    assert(p.contains("Sort ["), p.take(3000))
    // and it still computes the same result under the forced shuffles
    assert(out.count() === purchases.count())
  }

  test("left-only filters push through AsOfJoin to the scan") {
    val filtered = asofDf.filter(col("p_user") < 5 && col("s_id").isNotNull)
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the p_user predicate must sit BELOW the AsOfJoin (left child),
    // while the right-referencing IS NOT NULL stays above it
    val lines = optimized.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("AsOfJoin"))
    val pushIdx = lines.indexWhere(_.contains("p_user#") )
    val abovePart = lines.take(joinIdx).mkString("\n")
    assert(joinIdx >= 0, optimized.take(2000))
    assert(lines.drop(joinIdx + 1).exists(l =>
      l.contains("Filter") && l.contains("p_user")), optimized.take(3000))
    assert(abovePart.contains("isnotnull") && abovePart.contains("s_id"),
      optimized.take(3000))
    // results equal the unpushed semantics
    val reference = asofDf.collect().filter(r =>
      !r.isNullAt(r.fieldIndex("s_id")) && r.getLong(r.fieldIndex("p_user")) < 5)
    assert(filtered.count() === reference.length)
  }

  test("as-of matched timestamps never exceed the purchase time") {
    val bad = asofDf.filter(col("s_ts").isNotNull && col("s_ts") > col("p_ts"))
    assert(bad.count() === 0)
  }
}
