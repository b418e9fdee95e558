package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 39 (dedup family, SURVEY.md §2.4):
  *
  *  - d30: content-defined chunking — the storage/backup dedup
  *    primitive: chunk boundaries fall where a rolling window's hash
  *    meets a mask (so edits only reshape neighboring chunks, unlike
  *    fixed-width blocks), then chunk content hashes dedup globally.
  *    The index sequence explodes FIRST and the boundary test runs as
  *    codegen'd per-row expressions (the m10 lesson: staging an
  *    interpreted fold in a column re-evaluates per generated row);
  *    boundary rows drop the text before the window shuffle and the
  *    chunk extraction joins the corpus back once, so the shuffle
  *    carries spans, not documents. Every hash is md5 — bit-identical
  *    in DuckDB via the shared Md5Pack formulation.
  */
object TextOps18 {
  import Tables.t

  private val W = 16   // rolling window bytes
  private val Mask = 64 // boundary when hash % Mask == 0 (~64B chunks)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d30_cdc_chunks" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull && length(col("text")) >= W)
        .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      // explode the position index first; boundary test is codegen'd
      val bnd = docs
        .select(col("doc_id"), col("text"), col("len"),
          explode(sequence(lit(W), col("len"))).as("i"))
        .filter(pmod(graft.functions.Md5Pack(
            expr(s"substring(text, i - ${W - 1}, $W)")), lit(Mask)) === 0
          || col("i") === col("len"))
        .select(col("doc_id"), col("i"))
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("i")
      val spans = bnd
        .withColumn("start", coalesce(lag(col("i"), 1).over(wDoc), lit(0L))
          + 1)
        .select(col("doc_id"), col("start"), col("i").as("e"))
      val chunks = spans.join(docs.select(col("doc_id"), col("text")),
          "doc_id")
        .select(graft.functions.Md5Pack(
            expr("substring(text, start, e - start + 1)")).as("h"),
          (col("e") - col("start") + 1).as("clen"))
      chunks.agg(count(lit(1)).as("n_chunks"),
          count_distinct(col("h")).as("n_unique"),
          sum(col("clen")).as("total_bytes"))
        .select(col("n_chunks"), col("n_unique"), col("total_bytes"),
          round(lit(1.0) - col("n_unique").cast("double") /
            col("n_chunks").cast("double"), 6).as("dedup_ratio"),
          round(col("total_bytes").cast("double") /
            col("n_chunks").cast("double"), 6).as("avg_chunk_bytes"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d30_cdc_chunks" -> {
      val bndHash = Tables.duckMd5Pack(s"substr(text, i - ${W - 1}, $W)")
      val chunkHash = Tables.duckMd5Pack("substr(text, start, e - start + 1)")
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS len
         |  FROM documents
         |  WHERE text IS NOT NULL AND length(text) >= $W),
         |pos AS (
         |  SELECT doc_id, text, len, unnest(range($W, len + 1)) AS i
         |  FROM d),
         |bnd AS (
         |  SELECT doc_id, i FROM pos
         |  WHERE ($bndHash) % $Mask = 0 OR i = len),
         |spans AS (
         |  SELECT doc_id,
         |    coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0)
         |      + 1 AS start,
         |    i AS e
         |  FROM bnd),
         |chunks AS (
         |  SELECT ($chunkHash) AS h, e - start + 1 AS clen
         |  FROM spans JOIN d USING (doc_id)),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_chunks,
         |    CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
         |    CAST(sum(clen) AS BIGINT) AS total_bytes
         |  FROM chunks)
         |SELECT n_chunks, n_unique, total_bytes,
         |  round(1.0 - CAST(n_unique AS DOUBLE)
         |    / CAST(n_chunks AS DOUBLE), 6) AS dedup_ratio,
         |  round(CAST(total_bytes AS DOUBLE)
         |    / CAST(n_chunks AS DOUBLE), 6) AS avg_chunk_bytes
         |FROM agg""".stripMargin
    },
  )
}
