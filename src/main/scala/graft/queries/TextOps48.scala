package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 91 text ops (SURVEY.md §2.4):
  *
  *  - t47: quality-weighted deterministic sampling — importance
  *    sampling where longer (higher-"quality") documents get
  *    proportionally higher inclusion odds, decided by the same
  *    md5-threshold trick as q39's uniform sampler: include iff
  *    md5(doc) mod 1000 < min(n_chars/10, 1000). Pure integer
  *    comparison — reproducible across engines, partitionings, and
  *    reruns (the property grid-search data mixes need). Reports the
  *    kept set with per-source acceptance alongside the corpus rate.
  */
object TextOps48 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t47_weighted_sampling" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).as("nc"),
          pmod(graft.functions.Md5Pack(col("doc_id").cast("string")),
            lit(1000)).as("u"))
        .withColumn("w", least(expr("nc div 10"), lit(1000L)))
        .withColumn("kept", col("u") < col("w"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("kept")).as("n_kept"),
          sum(col("w")).as("w_sum"))
        .withColumn("accept_rate",
          round(col("n_kept").cast("double") / col("n_docs").cast("double"),
            6))
        .withColumn("expected_rate",
          round(col("w_sum").cast("double")
            / (col("n_docs") * 1000).cast("double"), 6))
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t47_weighted_sampling" -> {
      val h = Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    coalesce(n_chars, 0) AS nc,
         |    ($h) % 1000 AS u
         |  FROM documents),
         |k AS (
         |  SELECT doc_id, source,
         |    least(nc // 10, 1000) AS w,
         |    u < least(nc // 10, 1000) AS kept
         |  FROM d)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
         |  CAST(sum(w) AS BIGINT) AS w_sum,
         |  round(CAST(count(*) FILTER (kept) AS DOUBLE) / count(*), 6)
         |    AS accept_rate,
         |  round(CAST(sum(w) AS DOUBLE) / (count(*) * 1000), 6)
         |    AS expected_rate
         |FROM k GROUP BY 1 ORDER BY source""".stripMargin
    },
  )
}
