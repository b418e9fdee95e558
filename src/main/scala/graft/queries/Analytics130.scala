package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 156 (SURVEY.md §2.4):
  *
  *  - q333: process-capability indices Cp / Cpk for order totals
  *    against fixed spec limits [1000, 400000], plus observed vs
  *    normal-predicted out-of-spec PPM (Φ from StatSql) — the SPC
  *    companion to q315's control chart: the chart says "stable", the
  *    capability index says "fits the spec".
  *
  *  - q334: top-10 multivariate outliers by Mahalanobis distance over
  *    the (line count, total quantity, total discount) order features.
  *    Σ⁻¹ comes from the centered moment matrix via the adjugate
  *    (engine-neutral strings, same as q324/q330); the per-row
  *    quadratic form is map-only with the six c-terms broadcast, and
  *    the top-10 is a bounded ORDER BY ... LIMIT on the rounded
  *    distance with an order-key tiebreak.
  */
object Analytics130 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q333_cpk" -> ((spark, dir) => {
      val (lsl, usl) = (1000.0, 400000.0)
      val s = t(spark, dir, "orders").agg(count(lit(1)).as("n"),
        sum(expr("cast(round(o_totalprice, 2) as decimal(18,2))"))
          .as("sx"),
        sum(expr("cast(round(o_totalprice * o_totalprice, 4) " +
          "as decimal(38,4))")).as("sxx"),
        count_if(col("o_totalprice") < lsl
          || col("o_totalprice") > usl).as("n_oos"))
      val mu = "cast(sx as double) / n"
      val sd = s"""sqrt((cast(sxx as double) - n * ($mu) * ($mu))
                  | / (n - 1))""".stripMargin
      val zU = s"(($usl - ($mu)) / ($sd))"
      val zL = s"((($mu) - $lsl) / ($sd))"
      s.selectExpr("n",
        s"round(($usl - $lsl) / (6.0d * ($sd)), 6) as cp",
        s"round(least($zU, $zL) / 3.0d, 6) as cpk",
        "round(n_oos * 1000000.0d / n, 3) as observed_oos_ppm",
        s"""round(((1.0d - ${StatSql.phiSql(zU)})
           | + (1.0d - ${StatSql.phiSql(zL)})) * 1000000.0d, 3)
           | as normal_oos_ppm""".stripMargin)
    }),

    "q334_mahalanobis_outliers" -> ((spark, dir) => {
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
      val scored = feats.crossJoin(broadcast(m))
        .selectExpr("ok", "n", "s1", "s2", "s3",
          "cast(s11 as double) - cast(s1 as double) * cast(s1 as double) / n as c11",
          "cast(s22 as double) - cast(s2 as double) * cast(s2 as double) / n as c22",
          "cast(s33 as double) - cast(s3 as double) * cast(s3 as double) / n as c33",
          "cast(s12 as double) - cast(s1 as double) * cast(s2 as double) / n as c12",
          "cast(s13 as double) - cast(s1 as double) * cast(s3 as double) / n as c13",
          "cast(s23 as double) - cast(s2 as double) * cast(s3 as double) / n as c23",
          "cast(x1 as double) - cast(s1 as double) / n as d1",
          "cast(x2 as double) - cast(s2 as double) / n as d2",
          "cast(x3 as double) - cast(s3 as double) / n as d3")
        .selectExpr("ok", "n",
          """(c11 * (c22 * c33 - c23 * c23)
            | - c12 * (c12 * c33 - c23 * c13)
            | + c13 * (c12 * c23 - c22 * c13)) as det3""".stripMargin,
          """(d1 * d1 * (c22 * c33 - c23 * c23)
            | + d2 * d2 * (c11 * c33 - c13 * c13)
            | + d3 * d3 * (c11 * c22 - c12 * c12)
            | + 2 * d1 * d2 * (c13 * c23 - c12 * c33)
            | + 2 * d1 * d3 * (c12 * c23 - c13 * c22)
            | + 2 * d2 * d3 * (c12 * c13 - c11 * c23)) as qform"""
            .stripMargin)
        .selectExpr("ok",
          "round((n - 1.0d) * qform / det3, 6) as d2_maha")
      scored.orderBy(col("d2_maha").desc, col("ok")).limit(10)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q333_cpk" -> {
      val mu = "CAST(sx AS DOUBLE) / n"
      val sd = s"sqrt((CAST(sxx AS DOUBLE) - n * ($mu) * ($mu)) / (n - 1))"
      val zU = s"((400000.0 - ($mu)) / ($sd))"
      val zL = s"((($mu) - 1000.0) / ($sd))"
      s"""
      WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS sx,
          sum(CAST(round(o_totalprice * o_totalprice, 4)
            AS DECIMAL(38,4))) AS sxx,
          CAST(count(*) FILTER (WHERE o_totalprice < 1000.0
            OR o_totalprice > 400000.0) AS BIGINT) AS n_oos
        FROM orders)
      SELECT n,
        round((400000.0 - 1000.0) / (6.0 * ($sd)), 6) AS cp,
        round(least($zU, $zL) / 3.0, 6) AS cpk,
        round(n_oos * 1000000.0 / n, 3) AS observed_oos_ppm,
        round(((1.0 - ${StatSql.dedSuffix(StatSql.phiSql(zU))})
          + (1.0 - ${StatSql.dedSuffix(StatSql.phiSql(zL))}))
          * 1000000.0, 3) AS normal_oos_ppm
      FROM s"""
    },

    "q334_mahalanobis_outliers" -> """
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
      c AS (
        SELECT ok, n,
          CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n AS c11,
          CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n AS c22,
          CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / n AS c33,
          CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n AS c12,
          CAST(s13 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) / n AS c13,
          CAST(s23 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE) / n AS c23,
          CAST(x1 AS DOUBLE) - CAST(s1 AS DOUBLE) / n AS d1,
          CAST(x2 AS DOUBLE) - CAST(s2 AS DOUBLE) / n AS d2,
          CAST(x3 AS DOUBLE) - CAST(s3 AS DOUBLE) / n AS d3
        FROM feats CROSS JOIN m),
      q AS (
        SELECT ok, n,
          (c11 * (c22 * c33 - c23 * c23)
           - c12 * (c12 * c33 - c23 * c13)
           + c13 * (c12 * c23 - c22 * c13)) AS det3,
          (d1 * d1 * (c22 * c33 - c23 * c23)
           + d2 * d2 * (c11 * c33 - c13 * c13)
           + d3 * d3 * (c11 * c22 - c12 * c12)
           + 2 * d1 * d2 * (c13 * c23 - c12 * c33)
           + 2 * d1 * d3 * (c12 * c23 - c13 * c22)
           + 2 * d2 * d3 * (c12 * c13 - c11 * c23)) AS qform
        FROM c)
      SELECT ok, round((n - 1.0) * qform / det3, 6) AS d2_maha
      FROM q
      ORDER BY d2_maha DESC, ok LIMIT 10""",
  )
}
