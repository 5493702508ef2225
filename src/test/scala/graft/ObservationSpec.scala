package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Single-pass pipeline metrics via the Observation API — the batch
  * counterpart of the reference's per-file counters/mozlog metrics
  * (SURVEY §2-A A11): quality counters ride the same job as the
  * transformation, costing zero extra passes, and surface through a
  * driver-side handle (in production, a StreamingQueryListener or
  * metrics sink).
  */
class ObservationSpec extends GraftSpecBase {

  test("quality counters collect in the same pass as the transform") {
    val obs = Observation("ingest_quality")
    val e = Tables.events(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        count(when(col("value") <= 0, lit(1))).as("nonpositive_values"),
        count(when(col("event_type").isNull, lit(1))).as("null_types"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("value_sum"))
      .filter(col("event_type") === "purchase")
    val purchases = e.count()
    val m = obs.get
    assert(m("rows_seen") == Tables.events(spark, sf).count(),
      "observe sees pre-filter traffic")
    assert(m("nonpositive_values") == 0L)
    assert(m("null_types") == 0L)
    assert(m("value_sum").asInstanceOf[Double] > 0.0)
    assert(purchases > 0)
  }

  test("observe appears as CollectMetrics in the plan (no extra pass)") {
    val obs = Observation("plan_probe")
    val df = Tables.orders(spark, sf)
      .observe(obs, count(lit(1)).as("n"))
      .groupBy("o_orderstatus").count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan.take(500))
    assert(obs.get("n") == Tables.orders(spark, sf).count())
  }
}
