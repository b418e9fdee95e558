package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 126 (SURVEY.md §2.4):
  *
  *  - q292: grouped regression — one OLS model PER BRAND in a single
  *    aggregation pass (the "many small models" shape Spark excels
  *    at): ln(quantity) on ln(1 − discount) per brand, moments
  *    accumulated map-side with the q289 discipline (rounded-DECIMAL
  *    logs, cross-products as rounded-DECIMAL terms), closed-form
  *    slope/intercept/R² per group. No per-group iteration, no ML
  *    library — 25 models from one shuffle.
  */
object Analytics109 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q292_grouped_regression" -> ((spark, dir) => {
      val pts = t(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_discount"))
        .join(broadcast(t(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_discount") < 1 && col("l_quantity") > 0)
        .select(col("p_brand").as("brand"),
          expr("cast(round(ln(cast(l_quantity as double)), 9) " +
            "as decimal(18,9))").as("y"),
          expr("""cast(round(ln(cast(1.0 as double) - l_discount), 9)
                 |  as decimal(18,9))""".stripMargin).as("x"))
      def cross(a: String, b: String) =
        expr(s"cast(round(cast($a as double) * $b, 9) as decimal(28,9))")
      val m = pts.groupBy("brand").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(cross("x", "x")).as("sxx"),
        sum(cross("x", "y")).as("sxy"),
        sum(cross("y", "y")).as("syy"))
      m.select(col("brand"), col("n"),
          expr("""(cast(n as double) * cast(sxy as double)
                 |  - cast(sx as double) * cast(sy as double))
                 | / nullif(cast(n as double) * cast(sxx as double)
                 |  - cast(sx as double) * cast(sx as double), 0.0d)"""
            .stripMargin).as("b1"),
          col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
        .select(col("brand"), col("n"),
          round(col("b1"), 6).as("elasticity"),
          round(expr("""(cast(sy as double) - b1 * cast(sx as double))
                       | / n""".stripMargin), 6).as("intercept"),
          round(expr(
            """(cast(n as double) * cast(sxy as double)
              |  - cast(sx as double) * cast(sy as double))
              | * (cast(n as double) * cast(sxy as double)
              |  - cast(sx as double) * cast(sy as double))
              | / nullif((cast(n as double) * cast(sxx as double)
              |    - cast(sx as double) * cast(sx as double))
              |   * (cast(n as double) * cast(syy as double)
              |    - cast(sy as double) * cast(sy as double)), 0.0d)"""
              .stripMargin), 6).as("r2"))
        .orderBy("brand")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q292_grouped_regression" -> """
      WITH pts AS (
        SELECT p_brand AS brand,
          CAST(round(ln(CAST(l_quantity AS DOUBLE)), 9) AS DECIMAL(18,9))
            AS y,
          CAST(round(ln(CAST(1.0 AS DOUBLE) - l_discount), 9)
            AS DECIMAL(18,9)) AS x
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_discount < 1 AND l_quantity > 0),
      m AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS n,
          sum(x) AS sx, sum(y) AS sy,
          sum(CAST(round(CAST(x AS DOUBLE) * x, 9) AS DECIMAL(28,9)))
            AS sxx,
          sum(CAST(round(CAST(x AS DOUBLE) * y, 9) AS DECIMAL(28,9)))
            AS sxy,
          sum(CAST(round(CAST(y AS DOUBLE) * y, 9) AS DECIMAL(28,9)))
            AS syy
        FROM pts GROUP BY brand),
      sol AS (
        SELECT brand, n, sx, sy, sxy, sxx, syy,
          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS b1
        FROM m)
      SELECT brand, n,
        round(b1, 6) AS elasticity,
        round((CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)) / n, 6)
          AS intercept,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / nullif((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0), 6) AS r2
      FROM sol
      ORDER BY brand""",
  )
}
