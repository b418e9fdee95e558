package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 78 text ops (SURVEY.md §2.4):
  *
  *  - t40: suffix stemming (Porter-lite) — the vocabulary normalizer
  *    a token pipeline runs before building frequency tables: three
  *    ordered suffix rules (sses→ss, ies→i, trailing s dropped unless
  *    ss) applied per token, then the per-document type counts before
  *    and after — the vocab-shrink ratio quantifies how much the
  *    stemmer folds. Pure per-row array expressions (transform +
  *    nested regexp_replace chains), map-only; the rule chain is
  *    replayed verbatim by the oracle.
  */
object TextOps40 {
  import Tables.t

  /** The 3-rule chain; order matters and both engines apply it as one
    * nested expression: sses→ss first, then ies→i, then bare plural.
    */
  private def stem(tok: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(tok, "sses$", "ss"),
        "ies$", "i"),
      "([^s])s$", "$1")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t40_suffix_stem" -> ((spark, dir) => {
      val tk = split(col("text"), " ")
      t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(array_distinct(tk)).cast("long").as("n_types_raw"),
          size(array_distinct(transform(tk, stem(_)))).cast("long")
            .as("n_types_stemmed"))
        .withColumn("shrink",
          when(col("n_types_raw") > 0,
            round(lit(1.0) - col("n_types_stemmed").cast("double")
              / col("n_types_raw").cast("double"), 6)))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t40_suffix_stem" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(tk)) AS BIGINT) AS n_types_raw,
        |    CAST(len(list_distinct(list_transform(tk, t ->
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(t, 'sses$', 'ss'),
        |          'ies$', 'i'),
        |        '([^s])s$', '\1')))) AS BIGINT) AS n_types_stemmed
        |  FROM d)
        |SELECT doc_id, n_types_raw, n_types_stemmed,
        |  CASE WHEN n_types_raw > 0 THEN
        |    round(1.0 - CAST(n_types_stemmed AS DOUBLE) / n_types_raw, 6)
        |  END AS shrink
        |FROM s ORDER BY doc_id""".stripMargin,
  )
}
