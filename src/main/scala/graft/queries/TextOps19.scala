package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 40 (similarity family, SURVEY.md §2.4):
  *
  *  - s18: rerank shortlist tuning curve — the measurement that sizes
  *    s17's stage-1 width: for shortlist cutoffs 5/10/20, how much of
  *    the EXACT top-5 neighborhood does the quantized first pass
  *    retain? One quantized ranking pass serves all three cutoffs
  *    (rank once, count r1 ≤ k per cutoff); the exact side reuses s1.
  *    The curve is what an operator reads before trading stage-1 width
  *    against rerank cost at corpus scale.
  */
object TextOps19 {
  import Tables.t

  private val Cutoffs = Seq(5, 10, 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s18_rerank_tradeoff" -> ((spark, dir) => {
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
      val corpus = e.select(col("vec_id").as("cand_id"), deq.as("c_deq"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
      val stage1 = corpus.crossJoin(broadcast(probes))
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("c_deq")), 6).as("qc"))
        .groupBy("probe_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("qc")).as("neg"), col("cand_id").as("id")),
          Cutoffs.max).as("top"))
        .select(col("probe_id"), posexplode(col("top.id")))
        .select(col("probe_id"), col("col").as("cand_id"),
          (col("pos") + 1).as("r1"))
      val exact = TextOps.queries("s1_cosine_topk")(spark, dir)
        .select(col("probe_id"), col("cand_id"))
      val joined = exact.join(stage1, Seq("probe_id", "cand_id"), "left")
        .persist()
      joined.count()
      val ks = Cutoffs.map(k =>
        joined.agg(
            count_if(col("r1").isNotNull && col("r1") <= k).as("hits"),
            count(lit(1)).as("exact_pairs"))
          .select(lit(k).as("shortlist_k"), col("hits"),
            col("exact_pairs"),
            round(col("hits").cast("double") /
              col("exact_pairs").cast("double"), 6).as("recall")))
      ks.reduce(_ unionByName _).orderBy("shortlist_k")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s18_rerank_tradeoff" -> {
      val s1 = TextOps.oracleSql("s1_cosine_topk")
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
         |  SELECT probe_id, cand_id, r1 FROM (
         |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |      row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |        round(list_dot_product(p.emb, c.deq) /
         |          (sqrt(list_dot_product(p.emb, p.emb))
         |            * sqrt(list_dot_product(c.deq, c.deq))), 6) DESC,
         |        c.vec_id) AS r1
         |    FROM dq p JOIN dq c
         |      ON p.vec_id < 10 AND p.vec_id <> c.vec_id)
         |  WHERE r1 <= ${Cutoffs.max}),
         |exact AS (
         |  SELECT probe_id, cand_id FROM ($s1)),
         |j AS (
         |  SELECT e.probe_id, e.cand_id, s.r1
         |  FROM exact e LEFT JOIN stage1 s
         |    ON e.probe_id = s.probe_id AND e.cand_id = s.cand_id),
         |ks AS (${Cutoffs.map(k => s"SELECT $k AS shortlist_k")
            .mkString(" UNION ALL ")})
         |SELECT shortlist_k,
         |  CAST(count(*) FILTER (WHERE r1 IS NOT NULL
         |    AND r1 <= shortlist_k) AS BIGINT) AS hits,
         |  CAST(count(*) AS BIGINT) AS exact_pairs,
         |  round(CAST(count(*) FILTER (WHERE r1 IS NOT NULL
         |      AND r1 <= shortlist_k) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 6) AS recall
         |FROM ks, j GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
