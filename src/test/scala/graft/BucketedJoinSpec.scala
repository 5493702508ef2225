package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.functions._

/** Bucketing is the 100 TB co-located-join strategy the scale notes
  * keep citing — this spec PROVES the claim on this engine: two
  * tables bucketed on the join key join with ZERO shuffle exchanges,
  * while the same unbucketed join shuffles both sides.
  */
class BucketedJoinSpec extends GraftSpecBase {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE to finalize
    // AQE finalizes each shuffle into a ShuffleQueryStageExec wrapping
    // the exchange — count each boundary exactly once, recursing
    // through stage wrappers without re-counting the wrapped exchange
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      // a shuffle stage wraps its exchange: count the boundary once,
      // recurse below it
      case s: ShuffleQueryStageExec => 1 + s.plan.children.map(count).sum
      // other stages (result, broadcast, …) expose no children — go
      // through .plan
      case q: QueryStageExec => count(q.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed tables join without a shuffle; unbucketed tables shuffle") {
    val s = spark
    import s.implicits._
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      // disable BOTH broadcast thresholds (AQE re-plans SMJ→BHJ with
      // its own knob) so the join strategy under test is sort-merge
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val bucketed = s.table("b_orders")
        .join(s.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      // the JOIN itself is shuffle-free: only the groupBy exchanges
      assert(shuffles(bucketed) <= 1,
        "bucketed join must not shuffle its inputs")
      val plain = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(shuffles(plain) >= 2,
        "unbucketed sort-merge join shuffles both sides")
      // same relation either way
      assert(bucketed.orderBy("c_mktsegment").collect().toSeq ==
        plain.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) => s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => s.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
