package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 153 (SURVEY.md §2.4 statistics):
  *
  *  - q330: variance inflation factors for the q324 predictor set —
  *    the collinearity diagnostic (VIF_j = 1/(1−R²_j|others)) that
  *    decides whether q324's coefficients are trustworthy. Closed
  *    form from the same exact-decimal moment pass: VIF_j = c_jj ·
  *    adj_jj / det(C) over the centered 3×3 cross-moment matrix.
  *    Engine-neutral formula strings evaluated verbatim by both
  *    engines.
  */
object Analytics128 {
  import Tables.t

  private val Derived: Seq[(String, String)] = {
    def cen(ab: String, a: String, b: String) =
      s"cast(s$ab as double) - cast(s$a as double) * cast(s$b as double) / n"
    Seq(
      "c11" -> cen("11", "1", "1"), "c22" -> cen("22", "2", "2"),
      "c33" -> cen("33", "3", "3"), "c12" -> cen("12", "1", "2"),
      "c13" -> cen("13", "1", "3"), "c23" -> cen("23", "2", "3"),
      "det3" -> ("c11 * (c22 * c33 - c23 * c23)" +
        " - c12 * (c12 * c33 - c23 * c13)" +
        " + c13 * (c12 * c23 - c22 * c13)"),
      "vif1" -> "c11 * (c22 * c33 - c23 * c23) / det3",
      "vif2" -> "c22 * (c11 * c33 - c13 * c13) / det3",
      "vif3" -> "c33 * (c11 * c22 - c12 * c12) / det3")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q330_vif" -> ((spark, dir) => {
      val feats = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).cast("decimal(18,2)").as("x1"),
          sum(expr("cast(round(l_quantity, 2) as decimal(18,2))"))
            .as("x2"),
          sum(expr("cast(round(l_discount, 2) as decimal(18,2))"))
            .as("x3"))
      val m = feats.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x3")).as("s3"),
        sum(expr("cast(x1 as decimal(19,4)) * x1")).as("s11"),
        sum(expr("cast(x2 as decimal(19,4)) * x2")).as("s22"),
        sum(expr("cast(x3 as decimal(19,4)) * x3")).as("s33"),
        sum(expr("cast(x1 as decimal(19,4)) * x2")).as("s12"),
        sum(expr("cast(x1 as decimal(19,4)) * x3")).as("s13"),
        sum(expr("cast(x2 as decimal(19,4)) * x3")).as("s23"))
      val derived = Derived.foldLeft(m) { case (df, (nm, ex)) =>
        df.withColumn(nm, expr(ex))
      }
      derived.selectExpr(
          """stack(3,
            |  'x1_n_items', round(vif1, 6), round(1.0d - 1.0d / vif1, 6),
            |  'x2_total_qty', round(vif2, 6), round(1.0d - 1.0d / vif2, 6),
            |  'x3_total_disc', round(vif3, 6), round(1.0d - 1.0d / vif3, 6))
            |  as (predictor, vif, r2_on_others)""".stripMargin)
        .orderBy("predictor")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q330_vif" -> {
      val chain = Derived.zipWithIndex.map { case ((nm, ex), i) =>
        val prev = if (i == 0) "m" else s"d${i - 1}"
        s"d$i AS (SELECT *, ${ex.replaceAll("""(\d)d\b""", "$1")} AS $nm " +
          s"FROM $prev)"
      }.mkString(",\n      ")
      val last = s"d${Derived.length - 1}"
      s"""
      WITH feats AS (
        SELECT l_orderkey AS ok, CAST(count(*) AS DECIMAL(18,2)) AS x1,
          sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2))) AS x2,
          sum(CAST(round(l_discount, 2) AS DECIMAL(18,2))) AS x3
        FROM lineitem GROUP BY l_orderkey),
      m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
          sum(CAST(x1 AS DECIMAL(19,4)) * x1) AS s11,
          sum(CAST(x2 AS DECIMAL(19,4)) * x2) AS s22,
          sum(CAST(x3 AS DECIMAL(19,4)) * x3) AS s33,
          sum(CAST(x1 AS DECIMAL(19,4)) * x2) AS s12,
          sum(CAST(x1 AS DECIMAL(19,4)) * x3) AS s13,
          sum(CAST(x2 AS DECIMAL(19,4)) * x3) AS s23
        FROM feats),
      $chain
      SELECT predictor, vif, r2_on_others FROM (
        SELECT 'x1_n_items' AS predictor, round(vif1, 6) AS vif,
          round(1.0 - 1.0 / vif1, 6) AS r2_on_others FROM $last
        UNION ALL
        SELECT 'x2_total_qty', round(vif2, 6), round(1.0 - 1.0 / vif2, 6)
        FROM $last
        UNION ALL
        SELECT 'x3_total_disc', round(vif3, 6), round(1.0 - 1.0 / vif3, 6)
        FROM $last) u
      ORDER BY predictor"""
    },
  )
}
