package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 137 (SURVEY.md §2.4 time-series tests):
  * all three run on the monthly-revenue series — the fact table
  * condenses to a calendar-bounded frame FIRST (exact decimal sums),
  * so the window logic operates on ≤ hundreds of rows at any SF.
  *
  *  - q311: turning-point test of randomness — count local extrema
  *    among interior points; under H₀ E[T] = 2(n−2)/3,
  *    Var[T] = (16n−29)/90; report T, E, z. Pure integer counting.
  *
  *  - q312: Wald–Wolfowitz runs test above/below the series MEAN
  *    (exact from decimal sums — median would re-introduce a
  *    quantile); runs counted as sign changes + 1; z from the exact
  *    n⁺/n⁻ moments.
  *
  *  - q313: permutation entropy (order m=3): each consecutive triple
  *    maps to one of 6 ordinal patterns (ties broken by position,
  *    i.e. strict < on (value, index)); Shannon entropy of the
  *    pattern distribution over log₂6 normalizes to [0,1] — the
  *    standard model-free complexity measure of a series.
  */
object Analytics118 {
  import Tables.t

  private def monthly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(expr("cast(round(o_totalprice, 2) as decimal(18,2))"))
        .as("rev"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q311_turning_points" -> ((spark, dir) => {
      val w = Window.orderBy("m")
      val tp = monthly(spark, dir)
        .withColumn("prev", lag(col("rev"), 1).over(w))
        .withColumn("next", lead(col("rev"), 1).over(w))
        .filter(col("prev").isNotNull && col("next").isNotNull)
        .agg(count(lit(1)).as("interior"),
          count_if((col("rev") > col("prev") && col("rev") > col("next"))
            || (col("rev") < col("prev") && col("rev") < col("next")))
            .as("t"))
      tp.selectExpr("interior + 2 as n", "t",
          "round(2.0d * ((interior + 2) - 2) / 3.0d, 6) as expected_t",
          """round((t - 2.0d * ((interior + 2) - 2) / 3.0d)
            | / sqrt((16.0d * (interior + 2) - 29.0d) / 90.0d), 6)
            | as z""".stripMargin)
    }),

    "q312_runs_test" -> ((spark, dir) => {
      val mo = monthly(spark, dir)
      val mean = mo.agg(count(lit(1)).as("n"), sum(col("rev")).as("sr"))
        .selectExpr("n",
          """cast(round(cast(sr as double) / n, 6) as decimal(28,6))
            | as mu""".stripMargin)
      val signed = mo.crossJoin(broadcast(mean))
        .filter(col("rev") =!= col("mu"))
        .withColumn("above", (col("rev") > col("mu")).cast("int"))
        .withColumn("prev_above",
          lag(col("above"), 1).over(Window.orderBy("m")))
      val s = signed.agg(
        count(lit(1)).as("nn"),
        sum(col("above")).as("npos"),
        (count_if(col("prev_above").isNotNull &&
          col("above") =!= col("prev_above")) + 1L).as("runs"))
      s.selectExpr("npos", "nn - npos as nneg", "runs",
          """round(1.0d + 2.0d * npos * (nn - npos) / cast(nn as double),
            |  6) as expected_runs""".stripMargin,
          """round((runs - (1.0d + 2.0d * npos * (nn - npos)
            |    / cast(nn as double)))
            | / sqrt(2.0d * npos * (nn - npos)
            |   * (2.0d * npos * (nn - npos) - nn)
            |   / (cast(nn as double) * nn * (nn - 1.0d))), 6)
            | as z""".stripMargin)
    }),

    "q313_permutation_entropy" -> ((spark, dir) => {
      val w = Window.orderBy("m")
      val triples = monthly(spark, dir)
        .withColumn("a", lag(col("rev"), 2).over(w))
        .withColumn("b", lag(col("rev"), 1).over(w))
        .withColumn("c", col("rev"))
        .filter(col("a").isNotNull && col("b").isNotNull)
        // ordinal pattern of (a,b,c), ties broken by position (a≤b
        // counts as a-before-b): rank of each element by strict
        // (value, position) order
        .select(expr(
          """concat(
            |  cast((case when b < a then 1 else 0 end)
            |     + (case when c < a then 1 else 0 end) as string),
            |  cast((case when a <= b then 0 else 1 end)
            |     + (case when c < b then 1 else 0 end) as string),
            |  cast((case when a <= c then 0 else 1 end)
            |     + (case when b <= c then 0 else 1 end) as string))"""
            .stripMargin).as("pattern"))
      val dist = triples.groupBy("pattern").agg(count(lit(1)).as("c"))
      val tot = dist.agg(sum(col("c")).as("nt"))
      val ent = dist.crossJoin(broadcast(tot))
        .select(expr(
          """cast(round(-(c / cast(nt as double))
            |  * log2(c / cast(nt as double)), 9)
            |  as decimal(18,9))""".stripMargin).as("term"))
        .agg(sum(col("term")).as("h"))
      ent.crossJoin(broadcast(tot))
        .crossJoin(broadcast(dist.agg(count(lit(1)).as("k"))))
        .selectExpr("nt as n_triples", "k as n_patterns",
          "round(cast(h as double), 6) as entropy_bits",
          "round(cast(h as double) / log2(6.0d), 6) as normalized")
    }),
  )

  private val MonthlySql = """
        SELECT date_trunc('month', o_orderdate) AS m,
          sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1"""

  val oracleSql: Map[String, String] = Map(
    "q311_turning_points" -> s"""
      WITH monthly AS ($MonthlySql),
      tp AS (
        SELECT CAST(count(*) AS BIGINT) AS interior,
          CAST(count(*) FILTER (WHERE (rev > prev AND rev > next)
            OR (rev < prev AND rev < next)) AS BIGINT) AS t
        FROM (
          SELECT rev, lag(rev) OVER (ORDER BY m) AS prev,
            lead(rev) OVER (ORDER BY m) AS next
          FROM monthly) x
        WHERE prev IS NOT NULL AND next IS NOT NULL)
      SELECT interior + 2 AS n, t,
        round(2.0 * ((interior + 2) - 2) / 3.0, 6) AS expected_t,
        round((t - 2.0 * ((interior + 2) - 2) / 3.0)
          / sqrt((16.0 * (interior + 2) - 29.0) / 90.0), 6) AS z
      FROM tp""",

    "q312_runs_test" -> s"""
      WITH monthly AS ($MonthlySql),
      mn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(round(CAST(sum(rev) AS DOUBLE) / count(*), 6)
            AS DECIMAL(28,6)) AS mu
        FROM monthly),
      signed AS (
        SELECT m, CASE WHEN rev > mu THEN 1 ELSE 0 END AS above
        FROM monthly CROSS JOIN mn WHERE rev <> mu),
      runs AS (
        SELECT CAST(count(*) AS BIGINT) AS nn,
          CAST(sum(above) AS BIGINT) AS npos,
          CAST(count(*) FILTER (WHERE prev_above IS NOT NULL
            AND above <> prev_above) + 1 AS BIGINT) AS runs
        FROM (
          SELECT above, lag(above) OVER (ORDER BY m) AS prev_above
          FROM signed) x)
      SELECT npos, nn - npos AS nneg, runs,
        round(1.0 + 2.0 * npos * (nn - npos) / CAST(nn AS DOUBLE), 6)
          AS expected_runs,
        round((runs - (1.0 + 2.0 * npos * (nn - npos)
            / CAST(nn AS DOUBLE)))
          / sqrt(2.0 * npos * (nn - npos)
            * (2.0 * npos * (nn - npos) - nn)
            / (CAST(nn AS DOUBLE) * nn * (nn - 1.0))), 6) AS z
      FROM runs""",

    "q313_permutation_entropy" -> s"""
      WITH monthly AS ($MonthlySql),
      triples AS (
        SELECT concat(
            CAST((CASE WHEN b < a THEN 1 ELSE 0 END)
              + (CASE WHEN c < a THEN 1 ELSE 0 END) AS VARCHAR),
            CAST((CASE WHEN a <= b THEN 0 ELSE 1 END)
              + (CASE WHEN c < b THEN 1 ELSE 0 END) AS VARCHAR),
            CAST((CASE WHEN a <= c THEN 0 ELSE 1 END)
              + (CASE WHEN b <= c THEN 0 ELSE 1 END) AS VARCHAR))
          AS pattern
        FROM (
          SELECT lag(rev, 2) OVER (ORDER BY m) AS a,
            lag(rev, 1) OVER (ORDER BY m) AS b, rev AS c
          FROM monthly) x
        WHERE a IS NOT NULL AND b IS NOT NULL),
      dist AS (
        SELECT pattern, CAST(count(*) AS BIGINT) AS c
        FROM triples GROUP BY pattern),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS nt FROM dist),
      ent AS (
        SELECT sum(CAST(round(-(c / CAST(nt AS DOUBLE))
            * log2(c / CAST(nt AS DOUBLE)), 9) AS DECIMAL(18,9))) AS h
        FROM dist CROSS JOIN tot),
      k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM dist)
      SELECT nt AS n_triples, k AS n_patterns,
        round(CAST(h AS DOUBLE), 6) AS entropy_bits,
        round(CAST(h AS DOUBLE) / log2(6.0), 6) AS normalized
      FROM ent CROSS JOIN tot CROSS JOIN k""",
  )
}
