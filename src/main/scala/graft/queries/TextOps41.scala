package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 81 retrieval ops (SURVEY.md §2.4):
  *
  *  - s28: dedup-filtered search — the serving-side rule that search
  *    results must not show near-duplicates: the s1 exact cosine
  *    ranking re-ranked after dropping every candidate the d14
  *    embedding keep-list marked as a duplicate (keep = false), top-5
  *    kept per probe. Composes two existing verified pipelines with
  *    one broadcastable semi/anti join — the cheap, correct way to
  *    de-dup a result page without touching the index.
  */
object TextOps41 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s28_dedup_filtered_search" -> ((spark, dir) => {
      val keep = TextOps3.queries("d14_embedding_keep_list")(spark, dir)
        .filter(col("keep"))
        .select(col("vec_id").as("keep_id"))
      // s1 returns only its top-5; re-rank needs the deeper pool, so
      // rebuild the full scored frame the same way s1 does, then drop
      // non-keepers and take the fresh top-5
      val e = Tables.t(spark, dir, "embeddings")
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      val cands = e.select(col("vec_id").as("cand_id"),
        col("embedding").as("c_emb"))
      val scored = cands.join(broadcast(probes),
          col("probe_id") =!= col("cand_id"))
        .join(broadcast(keep), col("cand_id") === col("keep_id"), "left_semi")
        .select(col("probe_id"), col("cand_id"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("c_emb")), 6).as("cos"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("cos").desc, col("cand_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("probe_id", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s28_dedup_filtered_search" -> {
      val d14 = TextOps3.oracleSql("d14_embedding_keep_list")
      s"""WITH keepers AS MATERIALIZED (
         |  SELECT vec_id AS keep_id FROM ($d14) t WHERE keep),
         |e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |scored AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    round(list_dot_product(p.emb, c.emb) /
         |      (sqrt(list_dot_product(p.emb, p.emb))
         |        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id
         |  WHERE c.vec_id IN (SELECT keep_id FROM keepers))
         |SELECT probe_id, cand_id, cos, CAST(rank AS INTEGER) AS rank
         |FROM (
         |  SELECT probe_id, cand_id, cos,
         |    row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5 ORDER BY probe_id, rank""".stripMargin
    },
  )
}
