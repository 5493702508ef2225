package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.Determinism._

/** Join operators (SURVEY.md §2-B #6–#16). */
object JoinQueries {

  /** #16 q_join_star — flagship multi-join (TPC-H Q5 shape): revenue
    * by nation for one region and one order-date year.
    *
    * Scale: region/nation/customer are classic broadcast dimensions —
    * hinted explicitly so the only shuffle left is the
    * lineitem⋈orders equi-join (co-partitioned on orderkey) plus the
    * final small aggregation. At 100 TB, lineitem and orders would be
    * bucketed on orderkey making that join shuffle-free too.
    */
  def joinStar(s: SparkSession, d: String): DataFrame = {
    val dims = customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1997-01-01"))
    lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val joinStarSql: String =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
      |FROM region
      | JOIN nation   ON n_regionkey = r_regionkey
      | JOIN customer ON c_nationkey = n_nationkey
      | JOIN orders   ON o_custkey   = c_custkey
      | JOIN lineitem ON l_orderkey  = o_orderkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_star" -> (joinStar _))

  val oracle: Map[String, String] = Map(
    "q_join_star" -> joinStarSql)
}
