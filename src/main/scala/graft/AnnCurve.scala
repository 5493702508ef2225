package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN tuning-surface artifact (round-12, verdict item 8): recall@10
  * and candidate-scan fraction of the sign-hyperplane LSH across
  * bits ∈ {8, 12, 16} × probes ∈ {0, 1, 2}, averaged over the first
  * `SPARK_GRAFT_ANN_QUERIES` (20) corpus vectors as queries —
  * q_ann_recall grades ONE operating point exactly; this records the
  * whole dial surface so a deployment picks (bits, probes) from a
  * measured table (BASELINE.md round-12 section), not a default.
  *
  * Reading it: candidate fraction ≈ (1 + probes)/2^bits of the
  * corpus per query — bits buys scan reduction, probes buys recall
  * back. AnnCurveSpec pins the sound floor (for fixed bits, recall
  * is monotone non-decreasing in probes: the candidate set only
  * grows) and the recorded operating-point floor.
  *
  * Usage: graft.AnnCurve [sfDir] — prints one JSON line and writes
  * SPARK_GRAFT_ANN_OUT (ANNCURVE_r12.json).
  */
object AnnCurve {

  case class Point(bits: Int, probes: Int, recall: Double, frac: Double)

  /** The measured grid, shared with the spec (same code path). */
  def measure(spark: SparkSession, d: String, nQueries: Int,
      bitsList: Seq[Int] = Seq(8, 12, 16),
      probesList: Seq[Int] = Seq(0, 1, 2)): Seq[Point] = {
    import graft.functions.Ann
    val e = Tables.embeddings(spark, d)
    val n = e.count().toDouble
    // query vectors: the nQueries smallest vec_ids (deterministic)
    val queries = e.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // exact top-10 per query (the grading reference, computed once)
    val exact: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      qid -> Ann.bruteForceTopK(e, "vec_id", "embedding", qv, 10)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }.toMap
    for {
      bits <- bitsList
      probes <- probesList
    } yield {
      val (hits, cands) = queries.map { case (qid, qv) =>
        val planes = Ann.hyperplanes(bits, qv.length)
        val qBucket = planes.zipWithIndex.map { case (p, i) =>
          val proj = p.zip(qv).map { case (w, x) => w * x.toDouble }.sum
          if (proj >= 0) 1L << i else 0L
        }.sum
        val wanted = (qBucket +: (0 until math.min(probes, bits))
          .map(i => qBucket ^ (1L << i))).distinct
        val cand = e
          .withColumn("bucket", Ann.bucketCol(col("embedding"), planes))
          .filter(col("bucket").isin(wanted: _*))
        val nCand = cand.count()
        val got = Ann.bruteForceTopK(cand, "vec_id", "embedding", qv, 10)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        ((got & exact(qid)).size.toDouble / 10.0, nCand.toDouble / n)
      }.unzip
      Point(bits, probes,
        hits.sum / hits.length, cands.sum / cands.length)
    }
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "20").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ANN_OUT", "ANNCURVE_r12.json")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pts = measure(spark, d, nQ)
    val body = pts.map(p =>
      f"""{"bits":${p.bits},"probes":${p.probes},"recall_at_10":${p.recall}%.3f,"cand_frac":${p.frac}%.4f}""")
      .mkString("[", ",", "]")
    val json = s"""{"metric":"ann_curve","sf":"$d","n_queries":$nQ,"points":$body}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
