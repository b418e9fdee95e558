package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 68 retrieval ops (SURVEY.md §2.4):
  *
  *  - s25: L2 (Euclidean) top-k — completes the metric family next to
  *    cosine (s1): brute-force exact baseline over the codegen'd
  *    one-pass `L2Sq` expression (xx − 2·xy + yy from three sequential
  *    accumulators; the oracle replays the identical association via
  *    three list_dot_products). Distances round to 6dp BEFORE ranking
  *    so both engines order identically; ties break on cand_id.
  */
object TextOps36 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s25_l2_topk" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      val cands = e.select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb"))
      val scored = cands.join(broadcast(probes),
          col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          round(sqrt(graft.functions.GraftFunctions
            .l2Sq(col("p_emb"), col("c_emb"))), 6).as("l2"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("l2"), col("cand_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("probe_id", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s25_l2_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    round(sqrt(list_dot_product(p.emb, p.emb)
        |      - 2.0 * list_dot_product(p.emb, c.emb)
        |      + list_dot_product(c.emb, c.emb)), 6) AS l2
        |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id)
        |SELECT probe_id, cand_id, l2, CAST(rank AS INTEGER) AS rank
        |FROM (
        |  SELECT probe_id, cand_id, l2,
        |    row_number() OVER (
        |      PARTITION BY probe_id ORDER BY l2, cand_id) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin,
  )
}
