package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 63 retrieval/text ops (SURVEY.md §2.4):
  *
  *  - s24: reciprocal-rank-fusion hybrid retrieval — the standard
  *    two-leg production search: a SEMANTIC shortlist (embedding
  *    cosine, the s1 leg) and a LEXICAL shortlist (exact token
  *    Jaccard, the d2 leg) fused by RRF: score = Σ 1/(60+rank) over
  *    the legs where the candidate appears. Shortlists are top-20 per
  *    probe per leg (scores rounded BEFORE ranking so both engines
  *    rank identically), fused with a full outer join, top-5 kept.
  *    The probe set is bounded (10), so both legs are broadcast-probe
  *    map scans at any corpus size; ranks only ever exist on the
  *    shortlists, never the full corpus.
  *  - t36: lexical diversity — type-token ratio and Guiraud's root-TTR
  *    per document from one split: the curriculum/quality signal that
  *    separates varied prose from template spam. Map-only.
  */
object TextOps32 {
  import Tables.t

  /** Codegen'd cosine over float-array embeddings (shared expression). */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosine(a, b)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s24_rrf_hybrid" -> ((spark, dir) => {
      // token sets ride as 8-byte Md5Pack hashes through the per-probe
      // intersects (8x cheaper than string elements — see d2/PPJoin,
      // same 2^-62 collision caveat); sizes are length-preserved
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), graft.functions.Md5PackArr(
          array_distinct(split(col("text"), " "))).as("tk"))
      val e = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val cand = docs.join(e, col("doc_id") === col("vec_id"))
        .select(col("doc_id").as("cand_id"), col("tk").as("c_tk"),
          col("embedding").as("c_emb"))
      val probes = broadcast(docs.join(e, col("doc_id") === col("vec_id"))
        .filter(col("doc_id") < 10)
        .select(col("doc_id").as("probe_id"), col("tk").as("p_tk"),
          col("embedding").as("p_emb")))
      val scored = cand.join(probes, col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          round(cosine(col("p_emb"), col("c_emb")), 6).as("cos"),
          round(size(array_intersect(col("p_tk"), col("c_tk")))
            / (size(col("p_tk")) + size(col("c_tk"))
              - size(array_intersect(col("p_tk"), col("c_tk")))), 6)
            .as("jac"))
      def leg(score: String, rank: String): DataFrame = {
        val w = Window.partitionBy("probe_id")
          .orderBy(col(score).desc, col("cand_id"))
        scored.withColumn(rank, row_number().over(w))
          .filter(col(rank) <= 20)
          .select(col("probe_id"), col("cand_id"), col(rank))
      }
      val fused = leg("cos", "r_sem")
        .join(leg("jac", "r_lex"), Seq("probe_id", "cand_id"), "full_outer")
        .select(col("probe_id"), col("cand_id"),
          round(coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)), 6)
            .as("rrf"),
          col("r_sem").isNotNull.as("in_sem"),
          col("r_lex").isNotNull.as("in_lex"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("rrf").desc, col("cand_id"))
      fused.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("probe_id", "rank")
    }),

    "t36_lexical_diversity" -> ((spark, dir) => {
      t(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("n_types"))
        .withColumn("ttr",
          when(col("n_tokens") > 0,
            round(col("n_types").cast("double")
              / col("n_tokens").cast("double"), 6)))
        .withColumn("guiraud",
          when(col("n_tokens") > 0,
            round(col("n_types").cast("double")
              / sqrt(col("n_tokens").cast("double")), 6)))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s24_rrf_hybrid" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM documents JOIN embeddings ON doc_id = vec_id),
        |scored AS (
        |  SELECT p.doc_id AS probe_id, c.doc_id AS cand_id,
        |    round(list_dot_product(p.emb, c.emb)
        |      / (sqrt(list_dot_product(p.emb, p.emb))
        |        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos,
        |    round(len(list_intersect(p.tk, c.tk))
        |      / (len(p.tk) + len(c.tk) - len(list_intersect(p.tk, c.tk))),
        |      6) AS jac
        |  FROM docs p JOIN docs c
        |    ON p.doc_id < 10 AND p.doc_id <> c.doc_id),
        |sem AS (
        |  SELECT probe_id, cand_id, r_sem FROM (
        |    SELECT probe_id, cand_id, row_number() OVER (
        |      PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS r_sem
        |    FROM scored) WHERE r_sem <= 20),
        |lex AS (
        |  SELECT probe_id, cand_id, r_lex FROM (
        |    SELECT probe_id, cand_id, row_number() OVER (
        |      PARTITION BY probe_id ORDER BY jac DESC, cand_id) AS r_lex
        |    FROM scored) WHERE r_lex <= 20),
        |fused AS (
        |  SELECT coalesce(s.probe_id, l.probe_id) AS probe_id,
        |    coalesce(s.cand_id, l.cand_id) AS cand_id,
        |    round(coalesce(CAST(1.0 AS DOUBLE) / (60 + s.r_sem), 0.0)
        |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + l.r_lex), 0.0), 6) AS rrf,
        |    s.r_sem IS NOT NULL AS in_sem,
        |    l.r_lex IS NOT NULL AS in_lex
        |  FROM sem s FULL OUTER JOIN lex l
        |    ON s.probe_id = l.probe_id AND s.cand_id = l.cand_id)
        |SELECT probe_id, cand_id, rrf, in_sem, in_lex,
        |  CAST(rank AS INTEGER) AS rank
        |FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY probe_id ORDER BY rrf DESC, cand_id) AS rank
        |  FROM fused)
        |WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,

    "t36_lexical_diversity" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
        |  CASE WHEN len(string_split(text, ' ')) > 0 THEN
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')), 6) END AS ttr,
        |  CASE WHEN len(string_split(text, ' ')) > 0 THEN
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / sqrt(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6)
        |  END AS guiraud
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
