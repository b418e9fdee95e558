package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 150 (SURVEY.md §2.4 text):
  *
  *  - t57: Yule's characteristic K per source — the classical
  *    repeat-rate measure of vocabulary richness, K = 10⁴·(Σc² − N)/N²
  *    over the source's word-frequency spectrum. Pure integer counts
  *    (Σc² in DECIMAL(38,0)) and one double at the end; lower K =
  *    richer vocabulary. Complements t23/t36 (TTR-family diversity)
  *    with the size-invariant statistic.
  */
object TextOps64 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t57_yule_k" -> ((spark, dir) => {
      val counts = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      counts.groupBy("source").agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(expr("cast(c as decimal(38,0)) * c")).as("s2"))
        .selectExpr("source", "n_tokens", "n_types",
          """round(10000.0d * (cast(s2 as double) - n_tokens)
            | / (cast(n_tokens as double) * n_tokens), 6)
            | as yule_k""".stripMargin)
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t57_yule_k" -> """
      WITH counts AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL) x
        GROUP BY source, w)
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        round(10000.0 * (CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DOUBLE)
            - sum(c))
          / (CAST(sum(c) AS DOUBLE) * sum(c)), 6) AS yule_k
      FROM counts GROUP BY source ORDER BY source""",
  )
}
