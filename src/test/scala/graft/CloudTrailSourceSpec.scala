package graft

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.sources.CloudTrailScan
import graft.streaming.CloudTrailPipeline

/** The V2 batch connector must compute the SAME relation as the
  * text-source + decodeEnvelopes route (the streaming path), and
  * must prune columns at the reader. */
class CloudTrailSourceSpec extends GraftSpecBase {

  private def envelope(ids: String*): String =
    s"""{"Records": [${ids.map(i =>
        s"""{"eventID": "$i", "eventName": "PutObject", "eventTime": "2024-01-01T00:0${i.take(1)}:00Z", "eventSource": "s3.amazonaws.com", "awsRegion": "us-west-2", "readOnly": ${i.toInt % 2 == 0}, "userIdentity": {"type": "IAMUser", "principalId": "p$i", "arn": "arn:$i", "accountId": "a$i", "accessKeyId": "k$i"}, "requestParameters": {"bucketName": "b$i"}}""")
      .mkString(",")}]}"""

  private def fixtureDir(): File = {
    val dir = File.createTempFile("ctsrc", "")
    dir.delete(); dir.mkdirs()
    def writeGz(name: String, content: String): Unit = {
      val w = new OutputStreamWriter(new GZIPOutputStream(
        new FileOutputStream(new File(dir, name))), "UTF-8")
      w.write(content + "\n"); w.close()
    }
    writeGz("f1.json.gz", envelope("1", "2", "3"))
    writeGz("f2.json.gz", envelope("4"))
    // malformed line + empty envelope: must be skipped, not poison
    val w = new OutputStreamWriter(new GZIPOutputStream(
      new FileOutputStream(new File(dir, "f3.json.gz"))), "UTF-8")
    w.write("{not json\n"); w.write("""{"Records": []}""" + "\n")
    w.write(envelope("5") + "\n"); w.close()
    dir
  }

  private def viaSource(dir: File): DataFrame =
    spark.read.format("cloudtrail").load(dir.getAbsolutePath)

  private def viaText(dir: File): DataFrame =
    CloudTrailPipeline.decodeEnvelopes(
      spark.read.text(dir.getAbsolutePath + "/*.json.gz")
        .withColumnRenamed("value", "value"))

  test("source relation equals text+decodeEnvelopes relation") {
    val dir = fixtureDir()
    val a = viaSource(dir).orderBy("eventID")
    val b = viaText(dir).orderBy("eventID")
    assert(a.schema == b.schema)
    assert(a.collect().toSeq == b.collect().toSeq)
    assert(a.count() == 5)
  }

  test("nested and payload fields decode faithfully") {
    val dir = fixtureDir()
    val r = viaSource(dir).filter("eventID = '2'").collect().head
    assert(r.getAs[org.apache.spark.sql.Row]("userIdentity")
      .getAs[String]("principalId") == "p2")
    assert(r.getAs[Boolean]("readOnly"))
    assert(r.getAs[String]("requestParameters").contains("\"bucketName\""))
    assert(r.getAs[java.sql.Timestamp]("eventTime") != null)
  }

  test("column pruning reaches the scan (SupportsPushDownRequiredColumns)") {
    val dir = fixtureDir()
    val pruned = viaSource(dir).select("eventName")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty)
    val ct = scans.collectFirst { case c: CloudTrailScan => c }.get
    assert(ct.readSchema().fieldNames.toSeq == Seq("eventName"))
    assert(pruned.collect().length == 5)
  }

  test("one input partition per delivery file") {
    val dir = fixtureDir()
    val scan = CloudTrailScan(dir.getAbsolutePath,
      CloudTrailPipeline.recordSchema)
    assert(scan.planInputPartitions().length == 3)
  }

  test("count(*) with empty projection still yields one row per record") {
    val dir = fixtureDir()
    assert(viaSource(dir).count() == 5)
  }
}
