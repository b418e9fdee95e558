package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 155 (SURVEY.md §2.4 retrieval QA):
  *
  *  - s35: mean reciprocal rank of the s2 LSH index against the exact
  *    top-1 (s1) — the "how fast does the user see the right answer"
  *    metric next to recall (s4) and NDCG (s30). Reciprocal ranks
  *    over k ≤ 5 are exact SIXTIETHS (lcm(1..5) = 60), so MRR is pure
  *    integer arithmetic until one final division whose denominator
  *    (60·n_probes) cannot produce a 7-digit terminating half-
  *    boundary.
  */
object TextOps66 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s35_lsh_mrr" -> ((spark, dir) => {
      val exact1 = TextOps.queries("s1_cosine_topk")(spark, dir)
        .filter(col("rank") === 1)
        .select(col("probe_id"), col("cand_id").as("top1"))
      val approx = TextOps.queries("s2_ann_lsh")(spark, dir)
        .select(col("probe_id"), col("cand_id"), col("rank"))
      val rr = exact1.join(approx,
          Seq("probe_id"), "left")
        .select(col("probe_id"),
          when(col("cand_id") === col("top1"), expr("60 div rank"))
            .otherwise(0L).as("rr60"))
        .groupBy("probe_id").agg(max(col("rr60")).as("rr60"))
      rr.agg(count(lit(1)).as("n_probes"),
          count_if(col("rr60") > 0).as("n_hit"),
          sum(col("rr60")).as("s60"))
        .selectExpr("n_probes", "n_hit",
          "round(s60 / (60.0d * n_probes), 6) as mrr")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s35_lsh_mrr" -> s"""
      WITH exact1 AS (
        SELECT probe_id, cand_id AS top1
        FROM (${TextOps.oracleSql("s1_cosine_topk")}) e WHERE rank = 1),
      approx AS (
        SELECT probe_id, cand_id, rank
        FROM (${TextOps.oracleSql("s2_ann_lsh")}) a),
      rr AS (
        SELECT exact1.probe_id,
          max(CASE WHEN approx.cand_id = top1 THEN 60 // rank
            ELSE 0 END) AS rr60
        FROM exact1 LEFT JOIN approx
          ON exact1.probe_id = approx.probe_id
        GROUP BY exact1.probe_id)
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
        CAST(count(*) FILTER (WHERE rr60 > 0) AS BIGINT) AS n_hit,
        round(sum(rr60) / (60.0 * count(*)), 6) AS mrr
      FROM rr""",
  )
}
