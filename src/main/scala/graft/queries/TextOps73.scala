package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 73 (SURVEY.md §2.4):
  *
  *  - d58: corpus manifest — the per-source datasheet a training-data
  *    pipeline publishes with every corpus release: document and token
  *    mass, language mix (dominant language and its share), exact
  *    duplicate rate from content hashes, and the quality pass rate
  *    under the Gopher-style length/diversity floor. One pass over the
  *    corpus plus dimension-sized rollups; the dominant language comes
  *    from a source-partitioned rank, never a global sort. The whole
  *    release artifact is a single oracle-checked frame.
  */
object TextOps73 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d58_corpus_manifest" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"), col("lang"), col("doc_id"),
          col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          md5(col("text")).as("h"),
          (col("n_chars") >= 80 &&
            size(array_distinct(split(col("text"), " "))) >= 10)
            .as("passes"))
        .localCheckpoint(true) // base stats, lang mix, and dup rollups
      val base = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tok")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          count_if(col("passes")).as("quality_pass"))
      val topLang = docs.groupBy("source", "lang")
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(Window.partitionBy("source")
          .orderBy(col("c").desc, col("lang"))))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("c").as("top_lang_docs"))
      val dups = docs.groupBy("source", "h")
        .agg(count(lit(1)).as("ch"))
        .groupBy("source")
        .agg(sum(col("ch") - 1).as("n_exact_dups"))
      base.join(topLang, "source").join(dups, "source")
        .select(col("source"), col("n_docs"), col("total_chars"),
          col("total_tokens"), col("n_langs"), col("top_lang"),
          (col("top_lang_docs").cast("double")
            / col("n_docs").cast("double")).as("top_lang_share"),
          col("n_exact_dups"),
          (col("n_exact_dups").cast("double")
            / col("n_docs").cast("double")).as("dup_rate"),
          (col("quality_pass").cast("double")
            / col("n_docs").cast("double")).as("quality_pass_rate"))
        .orderBy("source")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d58_corpus_manifest" ->
      """WITH docs AS MATERIALIZED (
        |  SELECT source, lang, doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    md5(text) AS h,
        |    (n_chars >= 80
        |      AND len(list_distinct(string_split(text, ' '))) >= 10)
        |      AS passes
        |  FROM documents WHERE text IS NOT NULL),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(*) FILTER (passes) AS BIGINT) AS quality_pass
        |  FROM docs GROUP BY 1),
        |tl AS (
        |  SELECT source, lang AS top_lang, c AS top_lang_docs FROM (
        |    SELECT source, lang, CAST(count(*) AS BIGINT) AS c,
        |      row_number() OVER (PARTITION BY source
        |        ORDER BY count(*) DESC, lang) AS rk
        |    FROM docs GROUP BY source, lang)
        |  WHERE rk = 1),
        |dups AS (
        |  SELECT source, CAST(sum(ch - 1) AS BIGINT) AS n_exact_dups
        |  FROM (SELECT source, h, count(*) AS ch FROM docs GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT base.source, n_docs, total_chars, total_tokens, n_langs,
        |  top_lang,
        |  CAST(top_lang_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |    AS top_lang_share,
        |  n_exact_dups,
        |  CAST(n_exact_dups AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |    AS dup_rate,
        |  CAST(quality_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |    AS quality_pass_rate
        |FROM base JOIN tl ON base.source = tl.source
        |JOIN dups ON base.source = dups.source
        |ORDER BY base.source""".stripMargin,
  )
}
