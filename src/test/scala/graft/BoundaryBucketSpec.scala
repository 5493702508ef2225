package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.BoundaryBucket

/** BoundaryBucket (round-7 ADVICE): the codegen'd binary-search
  * bucketer must be value-identical to the |cuts|-deep when-chain it
  * replaced in PrefixOps.runningSums' explicit-boundaries path —
  * including the NULL→0 case, Spark's NaN-largest ordering, ±0.0,
  * duplicate cuts, and exact cut ties (>= places the row above).
  */
class BoundaryBucketSpec extends GraftSpecBase {

  /** The replaced declarative form, verbatim. */
  private def whenChain(cuts: Seq[Double]) =
    cuts.sorted.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(col("k") >= lit(cut), lit(1)).otherwise(lit(0)) }

  private val cutSets: Seq[Seq[Double]] = Seq(
    Seq(0.0),
    Seq(-3.5, 0.0, 2.25, 10.0),
    Seq(1.0, 1.0, 1.0), // duplicate cuts: ties collapse into one step
    (1 to 257).map(_.toDouble), // past any reasonable when-chain depth
    Seq(-0.0, 5.5))

  test("bucket equals the when-chain on fixture values, NULLs, NaN, ±0.0 and exact ties") {
    val base = Tables.events(spark, sf)
      .select(col("value").cast("double").as("k"))
    val edge = spark.createDataFrame(Seq(
      Tuple1(Option.empty[Double]), Tuple1(Some(Double.NaN)),
      Tuple1(Some(0.0)), Tuple1(Some(-0.0)), Tuple1(Some(1.0)),
      Tuple1(Some(-3.5)), Tuple1(Some(2.25)), Tuple1(Some(10.0)),
      Tuple1(Some(256.0)), Tuple1(Some(257.0)), Tuple1(Some(1e308)),
      Tuple1(Some(-1e308)))).toDF("k")
    val rows = base.unionByName(edge)
    cutSets.foreach { cuts =>
      val mism = rows
        .withColumn("fast", BoundaryBucket.bucket(col("k"), cuts))
        .withColumn("slow", whenChain(cuts))
        .where(!(col("fast") <=> col("slow"))).count()
      assert(mism == 0, s"cuts=$cuts: binary search diverges from when-chain")
    }
  }

  test("NULL and NaN keys follow the when-chain contract (0 and |cuts|)") {
    val cuts = Seq(-1.0, 0.5, 3.0)
    val out = spark.createDataFrame(Seq(
        Tuple1(Option.empty[Double]), Tuple1(Some(Double.NaN))))
      .toDF("k")
      .select(BoundaryBucket.bucket(col("k"), cuts).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, cuts.length))
  }

  test("interpreted eval matches codegen") {
    val cuts = Seq(-2.0, 0.0, 4.5, 4.5, 9.0)
    val keys = Seq(Double.NaN, -3.0, -2.0, 0.0, -0.0, 4.5, 9.0, 10.0)
    keys.foreach { k =>
      val expected = BoundaryBucket.bucketOf(cuts.sorted.toArray, k)
      val viaSpark = spark.range(1)
        .select(BoundaryBucket.bucket(lit(k).cast("double"), cuts).as("b"))
        .head().getInt(0)
      assert(viaSpark == expected, s"k=$k")
    }
  }
}
