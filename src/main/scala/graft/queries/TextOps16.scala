package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 36 (similarity family, SURVEY.md §2.4):
  *
  *  - s17: two-stage retrieval — the production search shape: a CHEAP
  *    first pass (int8 quantize→dequantize cosine, s10's bit-exact
  *    device) shortlists 20 candidates per probe through the bounded
  *    `TopKAgg.minK` aggregate (map-side combinable — no global
  *    window), then the expensive full-precision cosine reranks only
  *    the shortlist (≤20 rows per probe, so the rerank window is
  *    bounded by construction). At corpus scale stage 1 is the only
  *    full pass, and it reads 4× less effective precision; stage 2
  *    cost is fixed per probe. Both stages replay exactly in DuckDB
  *    (quantization arithmetic and tie-breaks included).
  */
object TextOps16 {
  import Tables.t

  private val Shortlist = 20
  private val K = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s17_two_stage_rerank" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("vmin", array_min(col("emb")))
        .withColumn("vmax", array_max(col("emb")))
      val deq = expr(
        "CASE WHEN vmax = vmin THEN transform(emb, x -> vmin) " +
          "ELSE transform(emb, x -> vmin + " +
          "(least(floor((x - vmin) * 255.0 / (vmax - vmin)), 255.0) + 0.5)" +
          " * ((vmax - vmin) / 256.0)) END")
      val corpus = e.select(col("vec_id").as("cand_id"),
        col("emb").as("c_emb"), deq.as("c_deq"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
      // stage 1: quantized scores, bounded min-k shortlist per probe
      val stage1 = corpus.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("c_deq")), 6).as("qc"))
        .groupBy("probe_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("qc")).as("neg"), col("cand_id").as("id")),
          Shortlist).as("top"))
        .select(col("probe_id"), explode(col("top.id")).as("cand_id"))
      // stage 2: full-precision rerank of the ≤20-row shortlist
      val rescored = stage1
        .join(probes, "probe_id")
        .join(corpus.select(col("cand_id"), col("c_emb")), "cand_id")
        .select(col("probe_id"), col("cand_id"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("c_emb")), 6).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("probe_id")
        .orderBy(col("cos").desc, col("cand_id"))
      rescored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .orderBy("probe_id", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s17_two_stage_rerank" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |mm AS (
         |  SELECT vec_id, emb, list_aggregate(emb, 'min') AS vmin,
         |    list_aggregate(emb, 'max') AS vmax
         |  FROM e),
         |dq AS (
         |  SELECT vec_id, emb,
         |    CASE WHEN vmax = vmin THEN list_transform(emb, x -> vmin)
         |    ELSE list_transform(emb, x -> vmin +
         |      (least(floor((x - vmin) * 255.0 / (vmax - vmin)), 255.0)
         |        + 0.5) * ((vmax - vmin) / 256.0)) END AS deq
         |  FROM mm),
         |stage1 AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |    round(list_dot_product(p.emb, c.deq) /
         |      (sqrt(list_dot_product(p.emb, p.emb))
         |        * sqrt(list_dot_product(c.deq, c.deq))), 6) AS qc
         |  FROM dq p JOIN dq c
         |    ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |shortlist AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY qc DESC, cand_id) AS r1
         |    FROM stage1)
         |  WHERE r1 <= $Shortlist),
         |rescored AS (
         |  SELECT s.probe_id, s.cand_id,
         |    round(list_dot_product(p.emb, c.emb) /
         |      (sqrt(list_dot_product(p.emb, p.emb))
         |        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
         |  FROM shortlist s
         |  JOIN dq p ON s.probe_id = p.vec_id
         |  JOIN dq c ON s.cand_id = c.vec_id)
         |SELECT probe_id, cand_id, cos, rank FROM (
         |  SELECT probe_id, cand_id, cos,
         |    CAST(row_number() OVER (PARTITION BY probe_id
         |      ORDER BY cos DESC, cand_id) AS INTEGER) AS rank
         |  FROM rescored)
         |WHERE rank <= $K ORDER BY probe_id, rank""".stripMargin,
  )
}
