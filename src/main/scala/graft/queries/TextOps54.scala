package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 108 dedup methods (SURVEY.md §2.4):
  *
  *  - d50: sorted-neighborhood dedup (SNM) — the third classic blocking
  *    family next to LSH (d4/d10) and prefix filtering (d11): sort the
  *    corpus by a cheap key (first three tokens), compare each record
  *    only against its w−1 = 4 successors in sort order. The global
  *    position comes from [[graft.operators.GlobalPrefixSum]] (range
  *    exchange + per-slice windows — never the single-task empty-
  *    PARTITION window), and the neighbor join is a banded equi-join:
  *    the right side probes its own and the previous 4-wide rank
  *    bucket, so each row meets a bounded candidate set — one shuffle,
  *    no corpus self-join. Candidates are verified with exact distinct-
  *    token Jaccard.
  */
object TextOps54 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d50_sorted_neighborhood" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 3), ' ')").as("k"),
          expr("array_distinct(split(text, ' '))").as("toks"))
      val ranked = graft.operators.GlobalPrefixSum
        .withRunningTotalBy(docs.withColumn("one", lit(1L)),
          struct(col("k"), col("doc_id")), "one", "rnk")
        .select(col("doc_id"), col("toks"), col("rnk"),
          ((col("rnk") - 1) / 4).cast("long").as("bkt"))
        .localCheckpoint(true) // feeds both sides of the band join
      val left = ranked.select(col("doc_id").as("a_id"),
        col("toks").as("ta"), col("rnk").as("ra"), col("bkt"))
      // each right row probes its own and the preceding bucket — every
      // in-window pair (distance 1..4) lands in exactly one equi-bucket
      val right = ranked
        .select(col("doc_id").as("b_id"), col("toks").as("tb"),
          col("rnk").as("rb"),
          explode(array(col("bkt"), col("bkt") - 1)).as("bkt"))
      left.join(right, "bkt")
        .filter(col("rb") - col("ra") >= 1 && col("rb") - col("ra") <= 4)
        .select(col("a_id"), col("b_id"),
          (col("rb") - col("ra")).as("rank_dist"),
          round(size(array_intersect(col("ta"), col("tb"))).cast("double")
            / size(array_union(col("ta"), col("tb"))).cast("double"), 6)
            .as("jaccard"))
        .withColumn("is_match", col("jaccard") >= 0.5)
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d50_sorted_neighborhood" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
        |      AS k,
        |    list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |r AS MATERIALIZED (
        |  SELECT doc_id, toks,
        |    CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS rnk
        |  FROM d)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  b.rnk - a.rnk AS rank_dist,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
        |        AS DOUBLE), 6) AS jaccard,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.toks, b.toks)))
        |        AS DOUBLE), 6) >= 0.5 AS is_match
        |FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 4
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
