package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 101 — spectral structure (SURVEY.md §2.4):
  *
  *  - s29: top principal component via power iteration — the PCA step
  *    every embedding-quality audit starts with. One distributed pass
  *    computes the exact moment matrix over the first 8 dimensions
  *    (components rounded to 8 decimals → DECIMAL(12,8), so every sum
  *    and cross-product is order-free and bit-identical in both
  *    engines); the 8×8 covariance then drives 6 unrolled power-method
  *    iterations v ← normalize(C·v) expressed as plain scalar columns
  *    on the one-row aggregate frame — every matvec and norm is a
  *    left-associated chain rendered identically to both engines, so
  *    the doubles replay bit-for-bit. Output: Rayleigh-quotient
  *    eigenvalue, explained-variance share (λ / trace C), and the
  *    sign-fixed component vector. Scale shape: the only data-sized
  *    work is the single moment aggregation (map-side combinable);
  *    everything after is O(d²) on one row.
  */
object TextOps53 {
  import Tables.t

  private val D = 8
  private val T = 6

  /** c-name helper over the upper-triangle storage. */
  private def cn(i: Int, j: Int): String =
    if (i <= j) s"c_${i}_$j" else s"c_${j}_$i"

  /** Left-associated matvec row i against vector columns `v<t>_j`. */
  private def matvec(i: Int, vPrefix: String): String =
    (0 until D).map(j => s"${cn(i, j)} * ${vPrefix}_$j").mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s29_pca_power" -> ((spark, dir) => {
      def xi(i: Int): String =
        s"CAST(round(CAST(embedding[$i] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as("n")) ++
          (0 until D).map(i => sum(expr(xi(i))).as(s"s_$i")) ++
          (for (i <- 0 until D; j <- i until D)
            yield sum(expr(s"${xi(i)} * ${xi(j)}")).as(s"p_${i}_$j"))
      var fr = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .agg(aggs.head, aggs.tail: _*)
      for (i <- 0 until D; j <- i until D)
        fr = fr.withColumn(s"c_${i}_$j", expr(
          s"""(CAST(p_${i}_$j AS DOUBLE)
             | - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE)
             |   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)""".stripMargin))
      for (i <- 0 until D)
        fr = fr.withColumn(s"v0_$i", expr("1.0 / sqrt(8.0)"))
      for (tt <- 1 to T) {
        for (i <- 0 until D)
          fr = fr.withColumn(s"w${tt}_$i", expr(matvec(i, s"v${tt - 1}")))
        fr = fr.withColumn(s"nrm$tt", expr("sqrt(" +
          (0 until D).map(i => s"w${tt}_$i * w${tt}_$i").mkString(" + ")
          + ")"))
        for (i <- 0 until D)
          fr = fr.withColumn(s"v${tt}_$i",
            expr(s"w${tt}_$i / nrm$tt"))
      }
      for (i <- 0 until D)
        fr = fr.withColumn(s"r_$i", expr(matvec(i, s"v$T")))
      val rayleigh =
        (0 until D).map(i => s"v${T}_$i * r_$i").mkString(" + ")
      val trace = (0 until D).map(i => s"c_${i}_$i").mkString(" + ")
      fr.select(
        Seq(col("n").as("n_vectors"),
          round(expr(rayleigh), 6).as("lambda1"),
          round(expr(s"($rayleigh) / ($trace)"), 6).as("explained_share")) ++
          (0 until D).map(i => round(expr(
            s"CASE WHEN v${T}_0 < 0 THEN -v${T}_$i ELSE v${T}_$i END"), 6)
            .as(s"v_$i")): _*)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s29_pca_power" -> {
      def xi(i: Int): String =
        s"CAST(round(CAST(embedding[${i + 1}] AS DOUBLE), 8) AS DECIMAL(12,8))"
      val moments =
        (Seq("CAST(count(*) AS BIGINT) AS n") ++
          (0 until D).map(i => s"sum(${xi(i)}) AS s_$i") ++
          (for (i <- 0 until D; j <- i until D)
            yield s"sum(${xi(i)} * ${xi(j)}) AS p_${i}_$j")).mkString(",\n    ")
      val covs = (for (i <- 0 until D; j <- i until D) yield
        s"""(CAST(p_${i}_$j AS DOUBLE)
           | - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE)
           |   / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS c_${i}_$j"""
          .stripMargin).mkString(",\n    ")
      val v0 = (0 until D)
        .map(i => s"1.0 / sqrt(8.0) AS v0_$i").mkString(", ")
      val iters = (1 to T).map { tt =>
        val ws = (0 until D)
          .map(i => s"${matvec(i, s"v${tt - 1}")} AS w${tt}_$i")
          .mkString(",\n    ")
        val nrm = "sqrt(" +
          (0 until D).map(i => s"w${tt}_$i * w${tt}_$i").mkString(" + ") + ")"
        s"""w$tt AS (SELECT *,
           |    $ws
           |  FROM ${if (tt == 1) "v0" else s"it${tt - 1}"}),
           |it$tt AS (SELECT *,
           |    ${(0 until D).map(i => s"w${tt}_$i / nrm$tt AS v${tt}_$i")
                .mkString(", ")}
           |  FROM (SELECT *, $nrm AS nrm$tt FROM w$tt))""".stripMargin
      }.mkString(",\n")
      val rayleigh =
        (0 until D).map(i => s"v${T}_$i * r_$i").mkString(" + ")
      val trace = (0 until D).map(i => s"c_${i}_$i").mkString(" + ")
      s"""WITH m AS (
         |  SELECT
         |    $moments
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |cov AS (SELECT *,
         |    $covs
         |  FROM m),
         |v0 AS (SELECT *, $v0 FROM cov),
         |$iters,
         |ray AS (SELECT *,
         |    ${(0 until D).map(i => s"${matvec(i, s"v$T")} AS r_$i")
              .mkString(", ")}
         |  FROM it$T)
         |SELECT n AS n_vectors,
         |  round($rayleigh, 6) AS lambda1,
         |  round(($rayleigh) / ($trace), 6) AS explained_share,
         |  ${(0 until D).map(i =>
             s"round(CASE WHEN v${T}_0 < 0 THEN -v${T}_$i ELSE v${T}_$i END, 6) AS v_$i")
            .mkString(",\n  ")}
         |FROM ray""".stripMargin
    },
  )
}
