package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 87 dedup ops (SURVEY.md §2.4):
  *
  *  - d45: RAG chunking with overlap + chunk-level dedup accounting —
  *    the retrieval-ingest shape: documents split into 32-token
  *    chunks at stride 24 (8-token overlap keeps context across
  *    boundaries), chunks keyed by md5; the corpus-level report gives
  *    total vs distinct chunks — the index-size savings duplicate
  *    passages buy. Chunk explosion is a bounded sequence explode per
  *    row (ceil(n/stride) chunks), hashing is per-row expression work,
  *    and the dedup census is one groupBy on the hash — the d30 CDC
  *    economics at a fixed stride. Short docs yield their single
  *    partial chunk.
  */
object TextOps46 {
  import Tables.t

  private val ChunkLen = 32
  private val Stride = 24

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d45_rag_chunks" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .withColumn("n_tok", size(col("tk")))
      val chunks = docs
        .withColumn("n_chunks",
          greatest(ceil((col("n_tok") - ChunkLen).cast("double") / Stride)
            .cast("int") + 1, lit(1)))
        .select(col("doc_id"), col("tk"), col("n_tok"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("ci"))
        .select(col("doc_id"), col("ci"),
          concat_ws(" ", slice(col("tk"), col("ci") * Stride + 1,
            lit(ChunkLen))).as("chunk"))
        .withColumn("h", md5(col("chunk")))
      val perChunk = chunks.groupBy("h")
        .agg(count(lit(1)).as("n_copies"))
      chunks.agg(count(lit(1)).as("n_chunks_total"),
          countDistinct(col("doc_id")).as("n_docs"))
        .crossJoin(perChunk.agg(
          count(lit(1)).as("n_chunks_distinct"),
          count_if(col("n_copies") >= 2).as("n_dup_groups"),
          sum(when(col("n_copies") >= 2, col("n_copies") - 1)
            .otherwise(0L)).as("n_redundant")))
        .select(col("n_docs"), col("n_chunks_total"),
          col("n_chunks_distinct"), col("n_dup_groups"),
          col("n_redundant"),
          round(col("n_redundant").cast("double")
            / col("n_chunks_total").cast("double"), 6).as("dedup_rate"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d45_rag_chunks" ->
      s"""WITH docs AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk,
         |    len(string_split(text, ' ')) AS n_tok
         |  FROM documents WHERE text IS NOT NULL),
         |sized AS (
         |  SELECT doc_id, tk, n_tok,
         |    greatest(CAST(ceil(CAST(n_tok - $ChunkLen AS DOUBLE)
         |      / $Stride) AS INTEGER) + 1, 1) AS n_chunks
         |  FROM docs),
         |chunks AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_slice(tk, ci * $Stride + 1,
         |      ci * $Stride + $ChunkLen), ' ')) AS h
         |  FROM (
         |    SELECT doc_id, tk, unnest(range(n_chunks)) AS ci
         |    FROM sized)),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_chunks_total,
         |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |  FROM chunks),
         |grp AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_chunks_distinct,
         |    CAST(count(*) FILTER (n_copies >= 2) AS BIGINT)
         |      AS n_dup_groups,
         |    CAST(sum(CASE WHEN n_copies >= 2 THEN n_copies - 1
         |      ELSE 0 END) AS BIGINT) AS n_redundant
         |  FROM (SELECT h, CAST(count(*) AS BIGINT) AS n_copies
         |        FROM chunks GROUP BY 1))
         |SELECT n_docs, n_chunks_total, n_chunks_distinct, n_dup_groups,
         |  n_redundant,
         |  round(CAST(n_redundant AS DOUBLE) / n_chunks_total, 6)
         |    AS dedup_rate
         |FROM tot CROSS JOIN grp""".stripMargin,
  )
}
