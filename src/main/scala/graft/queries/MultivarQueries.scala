package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-4 widening #46: closed-form multivariate analysis on the
  * (quantity, extendedprice) feature pair — exact 2×2 PCA (the
  * symmetric eigenproblem has a closed form, so the full PCA pipeline
  * is one moment scan + scalar arithmetic) and Mahalanobis-distance
  * outliers (the covariance-aware generalization of q_zscore /
  * q_outlier_iqr).
  *
  * Scale notes (100 TB): both queries are single-scan DECIMAL moment
  * aggregations (partial-aggregable, no shuffle beyond the k-group /
  * 1-row contraction) — the q_feature_corr shape; Mahalanobis scoring
  * joins the 1-row moment frame back via broadcast and takes top-k
  * through orderBy().limit() (TakeOrderedAndProject, no global
  * sort). A d-dimensional PCA at scale swaps the closed form for a
  * driver-side eigensolve of the d×d Gram matrix — same single-scan
  * moment pass, d² values collected, never the data.
  *
  * Determinism: moments are DECIMAL sums (q_feature_corr
  * convention); covariance entries round to 6dp before entering the
  * eigen/inverse arithmetic so both engines compute on identical
  * doubles; atan2/sqrt outputs round at 4–6dp (D2).
  */
object MultivarQueries {

  private def moments(df: DataFrame, by: Seq[Column]): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(col("q").cast("decimal(18,6)")).cast("double").as("sq"),
      sum(col("e").cast("decimal(18,6)")).cast("double").as("se"),
      sum((col("q") * col("q")).cast("decimal(27,6)")).cast("double").as("sqq"),
      sum((col("e") * col("e")).cast("decimal(27,6)")).cast("double").as("see"),
      sum((col("q") * col("e")).cast("decimal(27,6)")).cast("double").as("sqe"))
    val m = if (by.isEmpty) df.agg(aggs.head, aggs.tail: _*)
            else df.groupBy(by: _*).agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    // sample covariance entries, 6dp-rounded so downstream scalar
    // arithmetic starts from identical doubles in both engines
    m.withColumn("cxx",
        round((col("sqq") - col("sq") * col("sq") / nD) / (nD - 1), 6))
      .withColumn("cyy",
        round((col("see") - col("se") * col("se") / nD) / (nD - 1), 6))
      .withColumn("cxy",
        round((col("sqe") - col("sq") * col("se") / nD) / (nD - 1), 6))
      .withColumn("mq", round(col("sq") / nD, 6))
      .withColumn("me", round(col("se") / nD, 6))
  }

  private def momentsSql(groupCols: String): String = {
    val (sel, grp) =
      if (groupCols.isEmpty) ("", "")
      else (s"$groupCols, ", s"GROUP BY $groupCols")
    s"""SELECT ${sel}n, sq, se,
      |    round((sqq - sq*sq/n)/(n - 1), 6) AS cxx,
      |    round((see - se*se/n)/(n - 1), 6) AS cyy,
      |    round((sqe - sq*se/n)/(n - 1), 6) AS cxy,
      |    round(sq/n, 6) AS mq, round(se/n, 6) AS me
      |  FROM (SELECT ${sel}CAST(count(*) AS BIGINT) AS n,
      |      CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sq,
      |      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS se,
      |      CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sqq,
      |      CAST(sum(CAST(l_extendedprice*l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS see,
      |      CAST(sum(CAST(l_quantity*l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sqe
      |    FROM lineitem $grp) mom""".stripMargin
  }

  /** q_pca2 — exact 2×2 PCA per return flag: eigenvalues of the
    * sample covariance via the trace/determinant closed form
    * λ = T/2 ± √(T²/4 − D), explained-variance ratio λ₁/T, and the
    * first principal axis angle atan2(λ₁ − cxx, cxy) in degrees. */
  def pca2(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").as("q"), col("l_extendedprice").as("e"))
    val m = moments(li, Seq(col("l_returnflag")))
    val t = col("cxx") + col("cyy")
    val det = col("cxx") * col("cyy") - col("cxy") * col("cxy")
    val disc = sqrt(t * t / 4 - det)
    val lam1 = t / 2 + disc
    m.select(col("l_returnflag"), col("n"),
        round(lam1, 4).as("lam1"),
        round(t / 2 - disc, 4).as("lam2"),
        round(lam1 / t, 6).as("evr"),
        round(degrees(atan2(lam1 - col("cxx"), col("cxy"))), 4)
          .as("angle_deg"))
      .orderBy(col("l_returnflag"))
  }

  val pca2Oracle: String =
    s"""WITH m AS (${momentsSql("l_returnflag")})
      |SELECT l_returnflag, n,
      |  round((cxx + cyy)/2 +
      |    sqrt((cxx + cyy)*(cxx + cyy)/4 - (cxx*cyy - cxy*cxy)), 4) AS lam1,
      |  round((cxx + cyy)/2 -
      |    sqrt((cxx + cyy)*(cxx + cyy)/4 - (cxx*cyy - cxy*cxy)), 4) AS lam2,
      |  round(((cxx + cyy)/2 +
      |    sqrt((cxx + cyy)*(cxx + cyy)/4 - (cxx*cyy - cxy*cxy))) /
      |    (cxx + cyy), 6) AS evr,
      |  round(degrees(atan2((cxx + cyy)/2 +
      |    sqrt((cxx + cyy)*(cxx + cyy)/4 - (cxx*cyy - cxy*cxy)) - cxx,
      |    cxy)), 4) AS angle_deg
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** q_mahalanobis — the 10 line items farthest from the
    * (quantity, extendedprice) centroid in Mahalanobis distance:
    * d² = (cyy·dx² − 2·cxy·dx·dy + cxx·dy²)/(cxx·cyy − cxy²) against
    * the broadcast global covariance; top-k through orderBy().limit()
    * with a (d², orderkey, linenumber) total tie-break. */
  def mahalanobis(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").as("q"), col("l_extendedprice").as("e"))
    val m = moments(li, Seq.empty)
      .select(col("cxx"), col("cyy"), col("cxy"), col("mq"), col("me"))
    val dx = col("q") - col("mq")
    val dy = col("e") - col("me")
    li.crossJoin(broadcast(m))
      .select(col("l_orderkey"), col("l_linenumber"),
        round((col("cyy") * dx * dx - lit(2.0) * col("cxy") * dx * dy +
          col("cxx") * dy * dy) /
          (col("cxx") * col("cyy") - col("cxy") * col("cxy")), 6).as("d2"))
      .orderBy(col("d2").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(10)
  }

  val mahalanobisOracle: String =
    s"""WITH m AS (${momentsSql("")})
      |SELECT l_orderkey, l_linenumber,
      |  round((cyy*(l_quantity - mq)*(l_quantity - mq) -
      |    2.0*cxy*(l_quantity - mq)*(l_extendedprice - me) +
      |    cxx*(l_extendedprice - me)*(l_extendedprice - me)) /
      |    (cxx*cyy - cxy*cxy), 6) AS d2
      |FROM lineitem CROSS JOIN m
      |ORDER BY d2 DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pca2" -> (pca2 _),
    "q_mahalanobis" -> (mahalanobis _))

  val oracle: Map[String, String] = Map(
    "q_pca2" -> pca2Oracle,
    "q_mahalanobis" -> mahalanobisOracle)
}
