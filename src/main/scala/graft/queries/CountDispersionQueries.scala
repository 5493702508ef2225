package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-4 widening #64: count-dispersion diagnostics — the index of
  * dispersion (variance-to-mean ratio of daily event counts, the
  * Poisson overdispersion check that decides whether a count model
  * needs a negative-binomial upgrade) and Taylor's power law (the
  * ln-variance vs ln-mean slope across types — the classic
  * mean–variance scaling exponent).
  *
  * Scale notes (100 TB): both contract events to the bounded
  * (type × day) grid first; dispersion is per-type DECIMAL moments
  * over that grid; taylor fits one closed-form OLS over |types|
  * points. No windows, no raw-row retention.
  *
  * Determinism: daily counts are exact integers; means/variances
  * round at 8dp before ln; ln-pairs round at 8dp into DECIMAL sums;
  * D2 output rounding.
  */
object CountDispersionQueries {

  private def grid(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type"), to_date(col("ts2")).as("day"))
      .agg(count(lit(1)).as("x"))

  /** q_dispersion_index — per event type: D = s²/x̄ of daily counts
    * with the asymptotic z = (D−1)·√((n−1)/2) (D≈1 ⇒ Poisson-like;
    * D>1 ⇒ overdispersed). */
  def dispersionIndex(s: SparkSession, d: String): DataFrame = {
    val m = grid(s, d).groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val nD = col("n").cast("double")
    val mean = round(col("sx") / nD, 8)
    val v = round((col("sxx") - col("sx") * col("sx") / nD) / (nD - 1), 8)
    val dI = round(v / mean, 6)
    m.select(col("event_type"), col("n"), mean.as("mean_daily"),
        v.as("var_daily"), dI.as("dispersion"),
        round((dI - 1) * sqrt(round((nD - 1) / 2, 10)), 4).as("z"))
      .orderBy(col("event_type"))
  }

  val dispersionIndexOracle: String =
    """WITH grid AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(x*x) AS DOUBLE) AS sxx
      |  FROM grid GROUP BY 1),
      |t AS (SELECT event_type, n,
      |    round(sx/CAST(n AS DOUBLE), 8) AS mean_daily,
      |    round((sxx - sx*sx/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1), 8)
      |      AS var_daily
      |  FROM m)
      |SELECT event_type, n, mean_daily, var_daily,
      |  round(var_daily/mean_daily, 6) AS dispersion,
      |  round((round(var_daily/mean_daily, 6) - 1)
      |    * sqrt(round((CAST(n AS DOUBLE) - 1)/2, 10)), 4) AS z
      |FROM t ORDER BY event_type""".stripMargin

  /** q_taylor_law — Taylor's power law across event types:
    * ln s² = ln a + b·ln x̄ fitted by closed-form OLS over the
    * |types| (ln mean, ln variance) points; b is the scaling
    * exponent (1 = Poisson, 2 = clumped). */
  def taylorLaw(s: SparkSession, d: String): DataFrame = {
    val m = grid(s, d).groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val nD = col("n").cast("double")
    val pts = m.select(
      log(round(col("sx") / nD, 8)).as("lx"),
      log(round((col("sxx") - col("sx") * col("sx") / nD) / (nD - 1), 8))
        .as("ly"))
    val f = pts.agg(count(lit(1)).as("k"),
      sum(round(col("lx"), 8).cast("decimal(18,8)")).cast("double").as("sx"),
      sum(round(col("ly"), 8).cast("decimal(18,8)")).cast("double").as("sy"),
      sum(round(col("lx") * col("ly"), 8).cast("decimal(27,8)"))
        .cast("double").as("sxy"),
      sum(round(col("lx") * col("lx"), 8).cast("decimal(27,8)"))
        .cast("double").as("sxx"))
    val kD = col("k").cast("double")
    val b = round((kD * col("sxy") - col("sx") * col("sy"))
      / (kD * col("sxx") - col("sx") * col("sx")), 6)
    f.select(col("k"), b.as("taylor_b"),
      round((col("sy") - b * col("sx")) / kD, 6).as("ln_a"))
  }

  val taylorLawOracle: String =
    """WITH grid AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(x*x) AS DOUBLE) AS sxx
      |  FROM grid GROUP BY 1),
      |pts AS (SELECT
      |    ln(round(sx/CAST(n AS DOUBLE), 8)) AS lx,
      |    ln(round((sxx - sx*sx/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1),
      |      8)) AS ly
      |  FROM m),
      |f AS (SELECT CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(CAST(round(lx, 8) AS DECIMAL(18,8))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(round(ly, 8) AS DECIMAL(18,8))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(round(lx*ly, 8) AS DECIMAL(27,8))) AS DOUBLE)
      |      AS sxy,
      |    CAST(sum(CAST(round(lx*lx, 8) AS DECIMAL(27,8))) AS DOUBLE)
      |      AS sxx
      |  FROM pts)
      |SELECT k,
      |  round((CAST(k AS DOUBLE)*sxy - sx*sy)
      |    /(CAST(k AS DOUBLE)*sxx - sx*sx), 6) AS taylor_b,
      |  round((sy - round((CAST(k AS DOUBLE)*sxy - sx*sy)
      |      /(CAST(k AS DOUBLE)*sxx - sx*sx), 6)*sx)/CAST(k AS DOUBLE), 6)
      |    AS ln_a
      |FROM f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dispersion_index" -> (dispersionIndex _),
    "q_taylor_law" -> (taylorLaw _))

  val oracle: Map[String, String] = Map(
    "q_dispersion_index" -> dispersionIndexOracle,
    "q_taylor_law" -> taylorLawOracle)
}
