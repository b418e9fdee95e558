package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 95 text ops (SURVEY.md §2.4):
  *
  *  - t48: temperature-based language resampling plan — the
  *    multilingual mixing math (the XLM-R recipe): raw language shares
  *    p_l re-weighted as q_l ∝ p_l^τ (τ = 0.7), giving low-resource
  *    languages a boost without flattening the mix entirely. The
  *    output carries, per language, the raw and tempered shares, the
  *    per-document sampling multiplier q_l/p_l, and the expected
  *    corpus composition after resampling. pow() runs only on the
  *    5-language grid, pinned to 8dp before the cross-language
  *    normalization sums (which then run in exact DECIMAL).
  */
object TextOps50 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t48_temperature_sampling" -> ((spark, dir) => {
      val counts = t(spark, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_l"))
      val tot = counts.agg(sum(col("n_l")).as("n"))
      val tempered = counts.crossJoin(broadcast(tot))
        .withColumn("p", round(col("n_l").cast("double")
          / col("n").cast("double"), 8))
        .withColumn("pt",
          round(pow(col("n_l").cast("double") / col("n").cast("double"),
            0.7), 8).cast("decimal(18,8)"))
      val z = tempered.agg(sum(col("pt")).cast("decimal(38,8)").as("z"))
      tempered.crossJoin(broadcast(z))
        .withColumn("q",
          round(col("pt").cast("double") / col("z").cast("double"), 8))
        .withColumn("multiplier",
          round((col("pt").cast("double") / col("z").cast("double"))
            / (col("n_l").cast("double") / col("n").cast("double")), 6))
        .select(col("lang"), col("n_l"), col("p"), col("q"),
          col("multiplier"),
          (col("multiplier") > 1.0).as("upsampled"))
        .orderBy("lang")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t48_temperature_sampling" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_l
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS n FROM counts),
        |tempered AS (
        |  SELECT lang, n_l,
        |    round(CAST(n_l AS DOUBLE) / n, 8) AS p,
        |    CAST(round(pow(CAST(n_l AS DOUBLE) / n, 0.7), 8)
        |      AS DECIMAL(18,8)) AS pt
        |  FROM counts CROSS JOIN tot),
        |z AS (SELECT CAST(sum(pt) AS DECIMAL(38,8)) AS z FROM tempered),
        |fin AS (
        |  SELECT lang, n_l, p,
        |    round(CAST(pt AS DOUBLE) / CAST(z AS DOUBLE), 8) AS q,
        |    round((CAST(pt AS DOUBLE) / CAST(z AS DOUBLE)) / p_raw, 6)
        |      AS multiplier
        |  FROM (SELECT t.*, CAST(t.n_l AS DOUBLE)
        |          / (SELECT n FROM tot) AS p_raw
        |        FROM tempered t) CROSS JOIN z)
        |SELECT lang, n_l, p, q, multiplier, multiplier > 1.0 AS upsampled
        |FROM fin ORDER BY lang""".stripMargin,
  )
}
