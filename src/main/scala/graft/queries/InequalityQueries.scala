package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-4 widening #63: welfare-economics inequality measures over
  * the per-customer spend distribution — the Atkinson index at
  * aversion ε = 0.5 and ε = 1 (beside q_gini / q_theil / q_lorenz,
  * completing the standard inequality panel), and the Palma ratio
  * with its top-10% / bottom-40% shares.
  *
  * Scale notes (100 TB): both queries contract orders to the
  * |customers| spend aggregate first (keyed shuffle); Atkinson is
  * then a single-scan decimal-moment fold (no windows at all); Palma
  * ranks via ONE [[graft.operators.PrefixOps]] distributed prefix
  * pass — no partition-less window — and reads two cut rows off it.
  *
  * Determinism: spends are exact DECIMAL(18,2) sums; sqrt is
  * IEEE-correct on identical operands; ln/exp follow the house
  * protocol (8dp-rounded arguments, exp output pinned at 4dp);
  * per-row transforms round at 8dp into decimal sums (D2).
  */
object InequalityQueries {

  private def spend(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))

  private val spendSql: String =
    """SELECT o_custkey,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY 1""".stripMargin

  /** q_atkinson — Atkinson inequality of customer spend:
    * A(ε) = 1 − (mean of x^(1−ε))^(1/(1−ε)) / mean(x), so
    * A(0.5) = 1 − (mean √x)² / mean (sqrt-only, no transcendental
    * rounding at all) and A(1) = 1 − geomean/mean (ln/exp house
    * protocol). One scan over the spend aggregate. */
  def atkinson(s: SparkSession, d: String): DataFrame = {
    val x = col("spend").cast("double")
    val m = spend(s, d).agg(
      count(lit(1)).as("n"),
      sum(col("spend")).as("sx"),
      sum(round(sqrt(x), 8).cast("decimal(27,8)")).as("ssqrt"),
      sum(round(log(x), 8).cast("decimal(27,8)")).as("sln"))
    val nD = col("n").cast("double")
    val mean = col("sx").cast("double") / nD
    val mHalf = col("ssqrt").cast("double") / nD
    val gm = round(exp(round(col("sln").cast("double") / nD, 8)), 4)
    m.select(col("n"), round(mean, 4).as("mean_spend"),
      round(lit(1.0) - (mHalf * mHalf) / mean, 6).as("atkinson_05"),
      round(lit(1.0) - gm / mean, 6).as("atkinson_1"))
  }

  val atkinsonOracle: String =
    s"""WITH spend AS ($spendSql),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(spend) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(round(sqrt(CAST(spend AS DOUBLE)), 8)
      |      AS DECIMAL(27,8))) AS DOUBLE) AS ssqrt,
      |    CAST(sum(CAST(round(ln(CAST(spend AS DOUBLE)), 8)
      |      AS DECIMAL(27,8))) AS DOUBLE) AS sln
      |  FROM spend)
      |SELECT n, round(sx/CAST(n AS DOUBLE), 4) AS mean_spend,
      |  round(1.0 - ((ssqrt/CAST(n AS DOUBLE))*(ssqrt/CAST(n AS DOUBLE)))
      |    /(sx/CAST(n AS DOUBLE)), 6) AS atkinson_05,
      |  round(1.0 - round(exp(round(sln/CAST(n AS DOUBLE), 8)), 4)
      |    /(sx/CAST(n AS DOUBLE)), 6) AS atkinson_1
      |FROM m""".stripMargin

  /** q_palma — Palma ratio of customer spend: cumulative spend at the
    * bottom-40% and top-10% customer-count cutoffs (ascending spend
    * order, floor cutoffs) off one distributed prefix pass;
    * ratio = top-10% share / bottom-40% share. */
  def palma(s: SparkSession, d: String): DataFrame = {
    val sp = spend(s, d)
    val tot = sp.agg(count(lit(1)).as("n"), sum(col("spend")).as("total"))
    val pre = graft.operators.PrefixOps.runningSums(sp,
        col("spend"), Seq(col("spend"), col("o_custkey")),
        Seq("rn" -> lit(1L), "cum" -> col("spend")))
      .crossJoin(broadcast(tot))
    val kBot = floor(col("n").cast("double") * lit(0.4)).cast("long")
    val kTop = col("n") - floor(col("n").cast("double") * lit(0.1)).cast("long")
    pre.filter(col("rn") === kBot || col("rn") === kTop)
      .groupBy(col("n"), col("total"))
      .agg(
        min(when(col("rn") === kBot, col("cum"))).as("cum_bot"),
        min(when(col("rn") === kTop, col("cum"))).as("cum_top"))
      .select(col("n"),
        round(col("cum_bot").cast("double")
          / col("total").cast("double"), 6).as("bot40_share"),
        round((col("total") - col("cum_top")).cast("double")
          / col("total").cast("double"), 6).as("top10_share"),
        round(((col("total") - col("cum_top")).cast("double")
            / col("total").cast("double"))
          / (col("cum_bot").cast("double")
            / col("total").cast("double")), 6).as("palma_ratio"))
  }

  val palmaOracle: String =
    s"""WITH spend AS ($spendSql),
      |t AS (SELECT spend,
      |    row_number() OVER (ORDER BY spend, o_custkey) AS rn,
      |    sum(spend) OVER (ORDER BY spend, o_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    CAST(count(*) OVER () AS BIGINT) AS n,
      |    sum(spend) OVER () AS total
      |  FROM spend),
      |cuts AS (SELECT n, total,
      |    min(CASE WHEN rn = CAST(floor(CAST(n AS DOUBLE)*0.4) AS BIGINT)
      |      THEN cum END) AS cum_bot,
      |    min(CASE WHEN rn = n - CAST(floor(CAST(n AS DOUBLE)*0.1) AS BIGINT)
      |      THEN cum END) AS cum_top
      |  FROM t GROUP BY n, total)
      |SELECT n,
      |  round(CAST(cum_bot AS DOUBLE)/CAST(total AS DOUBLE), 6)
      |    AS bot40_share,
      |  round(CAST(total - cum_top AS DOUBLE)/CAST(total AS DOUBLE), 6)
      |    AS top10_share,
      |  round((CAST(total - cum_top AS DOUBLE)/CAST(total AS DOUBLE))
      |    /(CAST(cum_bot AS DOUBLE)/CAST(total AS DOUBLE)), 6)
      |    AS palma_ratio
      |FROM cuts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_atkinson" -> (atkinson _),
    "q_palma" -> (palma _))

  val oracle: Map[String, String] = Map(
    "q_atkinson" -> atkinsonOracle,
    "q_palma" -> palmaOracle)
}
