package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 similarity additions, batch 3 (SURVEY.md §2.4):
  *
  *  - s7: k-NN majority-vote label propagation — the semi-supervised
  *    labeling step of a training-data pipeline: each probe vector takes
  *    the majority label of its k=10 nearest labeled neighbors (cosine),
  *    reporting predicted vs actual. Probes are a bounded deterministic
  *    slice (vec_id % 25 == 0) broadcast against the corpus scan; both
  *    the neighbor top-k and the final arg-max run through the bounded
  *    TopKAgg, so nothing global is ever sorted and at most k rows per
  *    probe cross each shuffle.
  */
object TextOps7 {
  import Tables.t

  private val K = 10
  private val ProbeMod = 25

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s7_knn_classify" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
      val probes = e.filter(col("vec_id") % ProbeMod === 0)
        .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
          col("label").as("true_label"))
      val neigh = e.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb"), col("label").as("n_label"))
      // corpus scan streams past the broadcast probe set — one map-only
      // stage computes every (probe, neighbor) cosine, then the bounded
      // min-k keeps 10 per probe (neg-cos ascending = cosine descending,
      // n_id breaks rounded-cosine ties identically in both engines)
      val top = neigh.crossJoin(broadcast(probes))
        .filter(col("n_id") =!= col("p_id"))
        .select(col("p_id"), col("true_label"),
          round(graft.functions.VectorOps.cosine(col("n_emb"), col("p_emb")),
            6).as("cos"),
          col("n_id"), col("n_label"))
        .groupBy("p_id", "true_label")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("cos")).as("neg"), col("n_id").as("id"),
            col("n_label").as("lbl")), K).as("top"))
        .select(col("p_id"), col("true_label"),
          explode(col("top")).as("nb"))
      top.groupBy(col("p_id"), col("true_label"),
          col("nb.lbl").as("cand"))
        .agg(count(lit(1)).as("votes"))
        // majority vote: most votes, smallest label on ties — one more
        // bounded aggregate (k=1), never a window over the corpus
        .groupBy("p_id", "true_label")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("votes")).as("nv"), col("cand").as("lbl")), 1)
          .as("w"))
        .select(col("p_id").as("vec_id"), col("true_label"),
          col("w")(0)("lbl").as("pred_label"),
          (-col("w")(0)("nv")).as("votes"),
          (col("w")(0)("lbl") === col("true_label")).as("correct"))
        .orderBy("vec_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s7_knn_classify" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT vec_id AS p_id, label AS true_label, emb AS p_emb
         |  FROM e WHERE vec_id % $ProbeMod = 0),
         |scored AS (
         |  SELECT p_id, true_label, e.vec_id AS n_id, e.label AS n_label,
         |    round(list_dot_product(e.emb, p_emb) /
         |      (sqrt(list_dot_product(e.emb, e.emb))
         |        * sqrt(list_dot_product(p_emb, p_emb))), 6) AS cos
         |  FROM e CROSS JOIN p WHERE e.vec_id <> p_id),
         |knn AS (
         |  SELECT p_id, true_label, n_label FROM (
         |    SELECT p_id, true_label, n_label,
         |      row_number() OVER (PARTITION BY p_id
         |        ORDER BY cos DESC, n_id) AS rn
         |    FROM scored) WHERE rn <= $K),
         |votes AS (
         |  SELECT p_id, true_label, n_label AS cand,
         |    CAST(count(*) AS BIGINT) AS votes
         |  FROM knn GROUP BY 1, 2, 3)
         |SELECT p_id AS vec_id, true_label, cand AS pred_label, votes,
         |  cand = true_label AS correct
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY p_id
         |    ORDER BY votes DESC, cand) AS rv
         |  FROM votes) WHERE rv = 1
         |ORDER BY vec_id""".stripMargin,
  )
}
