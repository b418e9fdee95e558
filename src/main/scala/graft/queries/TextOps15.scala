package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 33 (text family, SURVEY.md §2.4):
  *
  *  - t29: dedup token savings — the headline number a training-data
  *    pipeline reports after near-dup removal: how many tokens does the
  *    kept corpus still carry, and what share of the raw token budget
  *    did dedup reclaim? Composes d12's keep list with the whitespace
  *    tokenizer; everything stays integer until the final share. At
  *    scale this is the d4→d8→d12 pipeline plus one token-count
  *    aggregation — no new shuffle beyond the keep-list join.
  */
object TextOps15 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t29_dedup_token_savings" -> ((spark, dir) => {
      val keep = TextOps3.queries("d12_keep_list")(spark, dir)
        .select(col("doc_id"), col("keep"))
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"),
          coalesce(size(split(col("text"), " ")), lit(0))
            .cast("long").as("n_tok"))
      docs.join(keep, "doc_id")
        .agg(
          count(lit(1)).as("n_docs_raw"),
          count_if(col("keep")).as("n_docs_kept"),
          sum(col("n_tok")).as("tok_raw"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L))
            .as("tok_kept"))
        .select(col("n_docs_raw"), col("n_docs_kept"),
          col("tok_raw"), col("tok_kept"),
          round(lit(1.0) - col("tok_kept").cast("double") /
            col("tok_raw").cast("double"), 6).as("savings"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t29_dedup_token_savings" -> {
      val d12 = TextOps3.oracleSql("d12_keep_list")
      s"""WITH keep AS ($d12),
         |docs AS (
         |  SELECT doc_id,
         |    coalesce(len(string_split(text, ' ')), 0) AS n_tok
         |  FROM documents),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs_raw,
         |    CAST(count(*) FILTER (WHERE keep) AS BIGINT)
         |      AS n_docs_kept,
         |    CAST(sum(n_tok) AS BIGINT) AS tok_raw,
         |    CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
         |      AS tok_kept
         |  FROM docs d JOIN keep k ON d.doc_id = k.doc_id)
         |SELECT n_docs_raw, n_docs_kept, tok_raw, tok_kept,
         |  round(1.0 - CAST(tok_kept AS DOUBLE)
         |    / CAST(tok_raw AS DOUBLE), 6) AS savings
         |FROM agg""".stripMargin
    },
  )
}
