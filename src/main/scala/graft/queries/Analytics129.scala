package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 154 (SURVEY.md §2.4 statistics):
  *
  *  - q331: Bayesian A/B — P(urgency rate in MACHINERY > BUILDING)
  *    under Beta(1,1) priors via the normal approximation to the
  *    posterior difference, Φ from the shared StatSql polynomial.
  *    The decision-ready complement to q88's frequentist test: one
  *    counting aggregate, one closed-form probability.
  *
  *  - q332: James–Stein / empirical-Bayes shrinkage of per-brand
  *    return rates toward the grand rate — the production fix for
  *    small-sample brand estimates. Method-of-moments τ² from the
  *    between-brand spread minus the average sampling variance
  *    (floored at 0); per-brand shrinkage B_i = σ_i²/(σ_i²+τ²). All
  *    inputs integer counts; denominators are raw data counts (never
  *    round numbers), keeping round(·,6) off half-boundaries.
  */
object Analytics129 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q331_bayes_ab" -> ((spark, dir) => {
      val seg = t(spark, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      val counts = t(spark, dir, "orders")
        .join(seg, col("o_custkey") === col("c_custkey"))
        .groupBy("seg").agg(count(lit(1)).as("n"),
          count_if(col("o_orderpriority") === "1-URGENT").as("x"))
      val wide = counts.agg(
        max(when(col("seg") === "BUILDING", col("n"))).as("na"),
        max(when(col("seg") === "BUILDING", col("x"))).as("xa"),
        max(when(col("seg") === "MACHINERY", col("n"))).as("nb"),
        max(when(col("seg") === "MACHINERY", col("x"))).as("xb"))
      val zExpr =
        """((xb + 1.0d) / (nb + 2.0d) - (xa + 1.0d) / (na + 2.0d))
          | / sqrt(((xa + 1.0d) / (na + 2.0d))
          |     * (1.0d - (xa + 1.0d) / (na + 2.0d)) / (na + 3.0d)
          |   + ((xb + 1.0d) / (nb + 2.0d))
          |     * (1.0d - (xb + 1.0d) / (nb + 2.0d)) / (nb + 3.0d))"""
          .stripMargin
      wide.selectExpr("na", "xa", "nb", "xb",
        s"round(${StatSql.phiSql(zExpr)}, 6) as prob_b_beats_a")
    }),

    "q332_james_stein" -> ((spark, dir) => {
      val per = t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n"),
          count_if(col("l_returnflag") === "R").as("x"))
      val tot = per.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"),
        count(lit(1)).as("k"))
      // between-brand spread of raw rates and mean sampling variance,
      // both from exact integer counts
      val spread = per.crossJoin(broadcast(tot))
        .select(expr(
          """cast(round((x / cast(n as double) - xx / cast(nn as double))
            |  * (x / cast(n as double) - xx / cast(nn as double)), 12)
            |  as decimal(28,12))""".stripMargin).as("dev2"),
          expr(
            """cast(round((xx / cast(nn as double))
              |  * (1.0d - xx / cast(nn as double)) / n, 12)
              |  as decimal(28,12))""".stripMargin).as("svar"))
        .agg(sum(col("dev2")).as("sdev2"), sum(col("svar")).as("ssvar"))
      val tau = spread.crossJoin(broadcast(tot))
        .selectExpr("nn", "xx", "k",
          """greatest(cast(sdev2 as double) / (k - 1)
            | - cast(ssvar as double) / k, 0.0d) as tau2""".stripMargin)
      per.crossJoin(broadcast(tau))
        .selectExpr("brand", "n", "x",
          "round(x / cast(n as double), 6) as raw_rate",
          """round(((xx / cast(nn as double))
            |   * (1.0d - xx / cast(nn as double)) / n)
            | / (((xx / cast(nn as double))
            |   * (1.0d - xx / cast(nn as double)) / n) + tau2), 6)
            | as shrink_b""".stripMargin,
          """round(xx / cast(nn as double)
            | + (1.0d - (((xx / cast(nn as double))
            |     * (1.0d - xx / cast(nn as double)) / n)
            |   / (((xx / cast(nn as double))
            |     * (1.0d - xx / cast(nn as double)) / n) + tau2)))
            |   * (x / cast(n as double) - xx / cast(nn as double)), 6)
            | as shrunk_rate""".stripMargin)
        .orderBy("brand")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q331_bayes_ab" -> {
      val zExpr = StatSql.dedSuffix(
        """((xb + 1.0) / (nb + 2.0) - (xa + 1.0) / (na + 2.0))
          | / sqrt(((xa + 1.0) / (na + 2.0))
          |     * (1.0 - (xa + 1.0) / (na + 2.0)) / (na + 3.0)
          |   + ((xb + 1.0) / (nb + 2.0))
          |     * (1.0 - (xb + 1.0) / (nb + 2.0)) / (nb + 3.0))"""
          .stripMargin)
      s"""
      WITH counts AS (
        SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
            AS BIGINT) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1),
      wide AS (
        SELECT
          max(CASE WHEN seg = 'BUILDING' THEN n END) AS na,
          max(CASE WHEN seg = 'BUILDING' THEN x END) AS xa,
          max(CASE WHEN seg = 'MACHINERY' THEN n END) AS nb,
          max(CASE WHEN seg = 'MACHINERY' THEN x END) AS xb
        FROM counts)
      SELECT na, xa, nb, xb,
        round(${StatSql.dedSuffix(StatSql.phiSql(zExpr))}, 6)
          AS prob_b_beats_a
      FROM wide"""
    },

    "q332_james_stein" -> """
      WITH per AS (
        SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS x
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(x) AS BIGINT) AS xx,
          CAST(count(*) AS BIGINT) AS k
        FROM per),
      spread AS (
        SELECT
          sum(CAST(round((x / CAST(n AS DOUBLE) - xx / CAST(nn AS DOUBLE))
            * (x / CAST(n AS DOUBLE) - xx / CAST(nn AS DOUBLE)), 12)
            AS DECIMAL(28,12))) AS sdev2,
          sum(CAST(round((xx / CAST(nn AS DOUBLE))
            * (1.0 - xx / CAST(nn AS DOUBLE)) / n, 12)
            AS DECIMAL(28,12))) AS ssvar
        FROM per CROSS JOIN tot),
      tau AS (
        SELECT nn, xx, k,
          greatest(CAST(sdev2 AS DOUBLE) / (k - 1)
            - CAST(ssvar AS DOUBLE) / k, 0.0) AS tau2
        FROM spread CROSS JOIN tot)
      SELECT brand, n, x,
        round(x / CAST(n AS DOUBLE), 6) AS raw_rate,
        round(((xx / CAST(nn AS DOUBLE))
            * (1.0 - xx / CAST(nn AS DOUBLE)) / n)
          / (((xx / CAST(nn AS DOUBLE))
            * (1.0 - xx / CAST(nn AS DOUBLE)) / n) + tau2), 6)
          AS shrink_b,
        round(xx / CAST(nn AS DOUBLE)
          + (1.0 - (((xx / CAST(nn AS DOUBLE))
              * (1.0 - xx / CAST(nn AS DOUBLE)) / n)
            / (((xx / CAST(nn AS DOUBLE))
              * (1.0 - xx / CAST(nn AS DOUBLE)) / n) + tau2)))
            * (x / CAST(n AS DOUBLE) - xx / CAST(nn AS DOUBLE)), 6)
          AS shrunk_rate
      FROM per CROSS JOIN tau
      ORDER BY brand""",
  )
}
