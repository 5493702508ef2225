package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.expressions.TopKStruct

/** [[TopKStruct]] — the k-bounded-heap grouped top-k aggregate:
  * exact equality with the window-rank idiom, map-side partial
  * aggregation in the plan (the scale claim), partition invariance
  * (the heap-merge path), and the small-group/null edges. */
class TopKStructSpec extends GraftSpecBase {

  private lazy val ev = Tables.events(spark, sf)

  test("top-3 per type equals the window row_number idiom exactly") {
    val viaAgg = ev.groupBy(col("event_type"))
      .agg(TopKStruct.topK(struct(
        col("value").cast("decimal(18,6)").as("v"),
        col("event_id").as("id")), 3).as("top"))
      .select(col("event_type"), explode(col("top")).as("t"))
      .select(col("event_type"), col("t.v").as("v"), col("t.id").as("id"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("v").desc, col("id").desc)
    val viaWin = ev.select(col("event_type"),
        col("value").cast("decimal(18,6)").as("v"),
        col("event_id").as("id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("event_type"), col("v"), col("id"))
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
  }

  test("result is invariant to input partitioning (heap merge path)") {
    def run(parts: Int) = ev.repartition(parts, col("event_id"))
      .groupBy(col("event_type"))
      .agg(TopKStruct.topK(struct(
        col("value").cast("decimal(18,6)").as("v"),
        col("event_id").as("id")), 5).as("top"))
      .select(col("event_type"), to_json(col("top")).as("j"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(run(1) == run(17))
  }

  test("plan shows two-phase aggregation (map-side partial heaps)") {
    val df = ev.groupBy(col("event_type"))
      .agg(TopKStruct.topK(struct(
        col("value").as("v"), col("event_id").as("id")), 3).as("top"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_top_k_struct"), p.take(3000))
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("groups smaller than k return every row; null structs ignored") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("b", None))
      .toDF("g", "x")
      .select(col("g"), when(col("x").isNotNull,
        struct(col("x").as("v"), col("x").as("id"))).as("s"))
      .groupBy(col("g")).agg(TopKStruct.topK(col("s"), 5).as("top"))
      .select(col("g"), size(col("top")).as("n"))
    val m = df.collect().map(r => (r.getString(0), r.getInt(1))).toMap
    assert(m == Map("a" -> 2, "b" -> 0))
  }

  test("descending array order with unique-id tiebreak is total") {
    val one = ev.filter(col("event_type") === "purchase")
      .agg(TopKStruct.topK(struct(
        col("value").cast("decimal(18,6)").as("v"),
        col("event_id").as("id")), 4).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.v").as("v"), col("t.id").as("id")).collect()
    val sorted = one.sortBy(r =>
      (r.getDecimal(0), r.getLong(1)))(Ordering.Tuple2(
        Ordering[java.math.BigDecimal].reverse, Ordering[Long].reverse))
    assert(one.toSeq == sorted.toSeq)
  }
}
