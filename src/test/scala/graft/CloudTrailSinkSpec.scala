package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.JavaConverters._

import org.apache.spark.SparkException

import graft.streaming.CloudTrailPipeline.RecordSink

/** Collecting sinks bound by class name (executors share the JVM in
  * local mode, so static state observes every task's calls). */
object SinkFixtures {
  val calls = new ConcurrentLinkedQueue[Int]()
  val records = new ConcurrentLinkedQueue[(String, String)]()
  val failuresLeft = new AtomicInteger(0)

  def reset(failFirst: Int = 0): Unit = {
    calls.clear(); records.clear(); failuresLeft.set(failFirst)
  }
}

class CollectingSink extends RecordSink {
  override def put(batch: Seq[(String, String)]): Seq[Int] = {
    SinkFixtures.calls.add(batch.size)
    if (SinkFixtures.failuresLeft.getAndDecrement() > 0) {
      // partial failure: last record bounces, the rest ARE delivered
      batch.init.foreach(SinkFixtures.records.add)
      batch.indices.takeRight(1)
    } else {
      batch.foreach(SinkFixtures.records.add)
      Seq.empty
    }
  }
}

class AlwaysFailingSink extends RecordSink {
  override def put(batch: Seq[(String, String)]): Seq[Int] = batch.indices
}

class CloudTrailSinkSpec extends GraftSpecBase {
  import spark.implicits._

  private def wire(n: Int) = (1 to n)
    .map(i => (s"pk${i % 7}", s"payload-$i"))
    .toDF("partitionKey", "data")

  test("delivers every record in <=500-record calls") {
    SinkFixtures.reset()
    wire(1203).repartition(2).write.format("cloudtrail-sink")
      .option("sinkClass", "graft.CollectingSink").mode("append").save()
    assert(SinkFixtures.records.size == 1203)
    assert(SinkFixtures.calls.asScala.forall(_ <= 500))
    assert(SinkFixtures.records.asScala.toSet ==
      (1 to 1203).map(i => (s"pk${i % 7}", s"payload-$i")).toSet)
  }

  test("partial failures are retried until delivered") {
    SinkFixtures.reset(failFirst = 2)
    wire(10).coalesce(1).write.format("cloudtrail-sink")
      .option("sinkClass", "graft.CollectingSink").mode("append").save()
    assert(SinkFixtures.records.size == 10)
    // 1 full call + 2 bounced-single retries
    assert(SinkFixtures.calls.size >= 3)
  }

  test("exhausted retries fail the job") {
    intercept[SparkException] {
      wire(5).coalesce(1).write.format("cloudtrail-sink")
        .option("sinkClass", "graft.AlwaysFailingSink").mode("append").save()
    }
  }

  test("schema contract is enforced") {
    intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").write.format("cloudtrail-sink")
        .option("sinkClass", "graft.CollectingSink").mode("append").save()
    }
  }
}
