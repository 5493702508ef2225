package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV and JSON-lines
  * round-trips with explicit schemas (schema inference is a 100 TB
  * anti-pattern — an extra full scan), and a partitioned parquet
  * layout whose partition column prunes at the source. */
class SourcesSpec extends GraftSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", IntegerType)))

  test("CSV round-trip with explicit schema preserves values") {
    val dir = tmp("graft_csv")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("int").as("n_chars"))
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docSchema).option("header", "true").csv(dir)
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0 && docs.except(back).count() === 0)
  }

  test("JSON-lines round-trip with explicit schema preserves values") {
    val dir = tmp("graft_json")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("int").as("n_chars"))
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    assert(back.except(docs).count() === 0 && docs.except(back).count() === 0)
  }

  test("gzip JSON reads transparently (non-splittable, 1 file = 1 task)") {
    val dir = tmp("graft_gz")
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"))
      .coalesce(1)
      .write.mode("overwrite").option("compression", "gzip").json(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gz"))
    assert(files.nonEmpty, "expected .json.gz output")
    val back = spark.read.schema(StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))).json(dir)
    assert(back.count() === Tables.documents(spark, sf).count())
  }

  test("ORC round-trip preserves values and pushes filters") {
    val dir = tmp("graft_orc")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("int").as("n_chars"))
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.except(docs).count() === 0 && docs.except(back).count() === 0)
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("doc_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"ORC scan must show pushed filters:\n$plan")
  }

  test("partitioned parquet layout prunes partitions at the source") {
    val dir = tmp("graft_part")
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(2000))
    // pruned read only touches the en partition
    val expected = Tables.documents(spark, sf)
      .filter(col("lang") === "en").count()
    assert(one.count() === expected)
  }
}
