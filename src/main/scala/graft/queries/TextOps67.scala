package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 158 (SURVEY.md §2.4 dedup QA):
  *
  *  - d53: blocking-quality metrics — pair completeness (what
  *    fraction of TRUE near-dup pairs land in the same block) and
  *    reduction ratio (what fraction of the quadratic pair space the
  *    blocking prunes) for a first-3-words blocking key, judged
  *    against d2's exact token-Jaccard pairs. THE design trade-off
  *    of every record-linkage/dedup blocking scheme, and the metric
  *    pair that justifies d4/d48/d50's schemes at 100 TB. All counts
  *    integer (block pair counts via n·(n−1)/2), ratios are single
  *    doubles over raw-count denominators.
  */
object TextOps67 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d53_blocking_quality" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("doc_id") < 200 && col("text").isNotNull)
        .select(col("doc_id"),
          expr("array_join(slice(split(text, ' '), 1, 3), ' ')")
            .as("bkey"))
      val truth = TextOps.queries("d2_token_jaccard")(spark, dir)
        .select(col("a_id"), col("b_id"))
      val pcNum = truth
        .join(docs.select(col("doc_id").as("a_id"),
          col("bkey").as("ka")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"),
          col("bkey").as("kb")), "b_id")
        .agg(count(lit(1)).as("n_true"),
          count_if(col("ka") === col("kb")).as("n_same_block"))
      val blocks = docs.groupBy("bkey").agg(count(lit(1)).as("nb"))
        .agg(sum(expr("nb * (nb - 1) div 2")).as("n_cand"),
          sum(col("nb")).as("nd"))
      pcNum.crossJoin(broadcast(blocks)).selectExpr(
        "n_true", "n_same_block", "n_cand",
        "nd * (nd - 1) div 2 as n_total_pairs",
        """round(n_same_block / cast(n_true as double), 6)
          | as pair_completeness""".stripMargin,
        """round(1.0d - n_cand
          |  / cast(nd * (nd - 1) div 2 as double), 6)
          | as reduction_ratio""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d53_blocking_quality" -> s"""
      WITH docs AS (
        SELECT doc_id,
          array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
            AS bkey
        FROM documents WHERE doc_id < 200 AND text IS NOT NULL),
      truth AS (
        SELECT a_id, b_id
        FROM (${TextOps.oracleSql("d2_token_jaccard")}) tr),
      pc AS (
        SELECT CAST(count(*) AS BIGINT) AS n_true,
          CAST(count(*) FILTER (WHERE a.bkey = b.bkey) AS BIGINT)
            AS n_same_block
        FROM truth
        JOIN docs a ON truth.a_id = a.doc_id
        JOIN docs b ON truth.b_id = b.doc_id),
      blocks AS (
        SELECT CAST(sum(nb * (nb - 1) // 2) AS BIGINT) AS n_cand,
          CAST(sum(nb) AS BIGINT) AS nd
        FROM (SELECT bkey, CAST(count(*) AS BIGINT) AS nb FROM docs
              GROUP BY bkey) x)
      SELECT n_true, n_same_block, n_cand,
        nd * (nd - 1) // 2 AS n_total_pairs,
        round(n_same_block / CAST(n_true AS DOUBLE), 6)
          AS pair_completeness,
        round(1.0 - n_cand / CAST(nd * (nd - 1) // 2 AS DOUBLE), 6)
          AS reduction_ratio
      FROM pc CROSS JOIN blocks""",
  )
}
