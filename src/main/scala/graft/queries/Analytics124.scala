package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 146 (SURVEY.md §2.4 statistics):
  *
  *  - q324: dominance analysis (LMG / Shapley R² decomposition) of
  *    order value on three order-shape predictors (line count, total
  *    quantity, total discount). ALL SEVEN nested OLS models — 3
  *    singles, 3 pairs, the full triple — come from ONE exact-decimal
  *    moment pass (closed-form normal equations: 2×2 by hand, 3×3 by
  *    adjugate), then each predictor's Shapley value over model
  *    subsets with the exact 1/3-1/6-1/6-1/3 weights. The classic
  *    "which feature actually carries the R²" answer without any ML
  *    library, iteration, or second data pass.
  *
  * Every post-moment formula is a single engine-neutral SQL string
  * evaluated verbatim by BOTH Spark and DuckDB (same expression tree
  * over the same exact decimal moments ⇒ bit-identical doubles).
  */
object Analytics124 {
  import Tables.t

  /** (name, engine-neutral SQL expr) chain evaluated in order. */
  private val Derived: Seq[(String, String)] = {
    def cen(ab: String, a: String, b: String) =
      s"cast(s$ab as double) - cast(s$a as double) * cast(s$b as double) / n"
    Seq(
      "c11" -> cen("11", "1", "1"), "c22" -> cen("22", "2", "2"),
      "c33" -> cen("33", "3", "3"), "c12" -> cen("12", "1", "2"),
      "c13" -> cen("13", "1", "3"), "c23" -> cen("23", "2", "3"),
      "c1y" -> cen("1y", "1", "y"), "c2y" -> cen("2y", "2", "y"),
      "c3y" -> cen("3y", "3", "y"), "cyy" -> cen("yy", "y", "y"),
      // single-predictor R²
      "r2_1" -> "c1y * c1y / (c11 * cyy)",
      "r2_2" -> "c2y * c2y / (c22 * cyy)",
      "r2_3" -> "c3y * c3y / (c33 * cyy)",
      // pairs via 2×2 normal equations
      "r2_12" -> ("((c1y * c22 - c2y * c12) * c1y" +
        " + (c2y * c11 - c1y * c12) * c2y)" +
        " / ((c11 * c22 - c12 * c12) * cyy)"),
      "r2_13" -> ("((c1y * c33 - c3y * c13) * c1y" +
        " + (c3y * c11 - c1y * c13) * c3y)" +
        " / ((c11 * c33 - c13 * c13) * cyy)"),
      "r2_23" -> ("((c2y * c33 - c3y * c23) * c2y" +
        " + (c3y * c22 - c2y * c23) * c3y)" +
        " / ((c22 * c33 - c23 * c23) * cyy)"),
      // full model via the 3×3 adjugate
      "det3" -> ("c11 * (c22 * c33 - c23 * c23)" +
        " - c12 * (c12 * c33 - c23 * c13)" +
        " + c13 * (c12 * c23 - c22 * c13)"),
      "r2_123" -> ("(c1y * c1y * (c22 * c33 - c23 * c23)" +
        " + c2y * c2y * (c11 * c33 - c13 * c13)" +
        " + c3y * c3y * (c11 * c22 - c12 * c12)" +
        " + 2 * c1y * c2y * (c13 * c23 - c12 * c33)" +
        " + 2 * c1y * c3y * (c12 * c23 - c13 * c22)" +
        " + 2 * c2y * c3y * (c12 * c13 - c11 * c23))" +
        " / (det3 * cyy)"),
      // Shapley over subset orderings (k=3 weights 1/3,1/6,1/6,1/3)
      "phi1" -> ("(2 * r2_1 + (r2_12 - r2_2) + (r2_13 - r2_3)" +
        " + 2 * (r2_123 - r2_23)) / 6"),
      "phi2" -> ("(2 * r2_2 + (r2_12 - r2_1) + (r2_23 - r2_3)" +
        " + 2 * (r2_123 - r2_13)) / 6"),
      "phi3" -> ("(2 * r2_3 + (r2_13 - r2_1) + (r2_23 - r2_2)" +
        " + 2 * (r2_123 - r2_12)) / 6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q324_dominance_lmg" -> ((spark, dir) => {
      val feats = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        // x1 as DECIMAL(18,2) like x2/x3/y: every moment product is then
        // (19,4)×(18,2) — exact (≤38 digits) in BOTH engines; a
        // bigint×decimal product would exceed Spark's 38 and round
        .agg(count(lit(1)).cast("decimal(18,2)").as("x1"),
          sum(expr("cast(round(l_quantity, 2) as decimal(18,2))"))
            .as("x2"),
          sum(expr("cast(round(l_discount, 2) as decimal(18,2))"))
            .as("x3"))
        .join(t(spark, dir, "orders").select(col("o_orderkey"),
          expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("y")),
          col("ok") === col("o_orderkey"))
      val m = feats.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x3")).as("s3"), sum(col("y")).as("sy"),
        sum(expr("cast(x1 as decimal(19,4)) * x1")).as("s11"),
        sum(expr("cast(x2 as decimal(19,4)) * x2")).as("s22"),
        sum(expr("cast(x3 as decimal(19,4)) * x3")).as("s33"),
        sum(expr("cast(x1 as decimal(19,4)) * x2")).as("s12"),
        sum(expr("cast(x1 as decimal(19,4)) * x3")).as("s13"),
        sum(expr("cast(x2 as decimal(19,4)) * x3")).as("s23"),
        sum(expr("cast(x1 as decimal(19,4)) * y")).as("s1y"),
        sum(expr("cast(x2 as decimal(19,4)) * y")).as("s2y"),
        sum(expr("cast(x3 as decimal(19,4)) * y")).as("s3y"),
        sum(expr("cast(y as decimal(19,4)) * y")).as("syy"))
      val derived = Derived.foldLeft(m) { case (df, (nm, ex)) =>
        df.withColumn(nm, expr(ex))
      }
      derived.selectExpr(
        """stack(3,
          |  'x1_n_items', round(r2_1, 6), round(phi1, 6),
          |  'x2_total_qty', round(r2_2, 6), round(phi2, 6),
          |  'x3_total_disc', round(r2_3, 6), round(phi3, 6))
          |  as (predictor, r2_alone, shapley_r2)""".stripMargin,
        "round(r2_123, 6) as r2_full")
        .orderBy("predictor")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q324_dominance_lmg" -> {
      val chain = Derived.zipWithIndex.map { case ((nm, ex), i) =>
        val prev = if (i == 0) "m" else s"d${i - 1}"
        s"d$i AS (SELECT *, $ex AS $nm FROM $prev)"
      }.mkString(",\n      ")
      val last = s"d${Derived.length - 1}"
      s"""
      WITH feats AS (
        SELECT l_orderkey AS ok, CAST(count(*) AS DECIMAL(18,2)) AS x1,
          sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2))) AS x2,
          sum(CAST(round(l_discount, 2) AS DECIMAL(18,2))) AS x3
        FROM lineitem GROUP BY l_orderkey),
      j AS (
        SELECT x1, x2, x3,
          CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS y
        FROM feats JOIN orders ON ok = o_orderkey),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
          sum(y) AS sy,
          sum(CAST(x1 AS DECIMAL(19,4)) * x1) AS s11,
          sum(CAST(x2 AS DECIMAL(19,4)) * x2) AS s22,
          sum(CAST(x3 AS DECIMAL(19,4)) * x3) AS s33,
          sum(CAST(x1 AS DECIMAL(19,4)) * x2) AS s12,
          sum(CAST(x1 AS DECIMAL(19,4)) * x3) AS s13,
          sum(CAST(x2 AS DECIMAL(19,4)) * x3) AS s23,
          sum(CAST(x1 AS DECIMAL(19,4)) * y) AS s1y,
          sum(CAST(x2 AS DECIMAL(19,4)) * y) AS s2y,
          sum(CAST(x3 AS DECIMAL(19,4)) * y) AS s3y,
          sum(CAST(y AS DECIMAL(19,4)) * y) AS syy
        FROM j),
      $chain
      SELECT u.predictor, u.r2_alone, u.shapley_r2,
        round(r2_123, 6) AS r2_full
      FROM $last, (
        SELECT 'x1_n_items' AS predictor, round(r2_1, 6) AS r2_alone,
          round(phi1, 6) AS shapley_r2 FROM $last
        UNION ALL
        SELECT 'x2_total_qty', round(r2_2, 6), round(phi2, 6) FROM $last
        UNION ALL
        SELECT 'x3_total_disc', round(r2_3, 6), round(phi3, 6)
        FROM $last) u
      ORDER BY u.predictor"""
    },
  )
}
