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
  *  - d22: passage-level dedup verdicts — documents are cut into
  *    16-token chunks at stride 8 (the RAG passage grain) and a chunk
  *    found verbatim in ≥2 distinct documents marks boilerplate; each
  *    doc reports its duplicated-chunk ratio and the keep/drop verdict a
  *    corpus build would apply. Chunking is a row-local native
  *    sequence/slice transform (no shuffle); the only shuffles are the
  *    chunk-hash groupBy and the per-doc rollup, both map-side
  *    combinable, with dup chunks flowing back through a left_semi join.
  *  - s8: maximum-inner-product search (MIPS) with the norm-augmentation
  *    reduction — retrieval under UNnormalized scores (recommendation /
  *    reward-model use cases where magnitude matters). The query reports
  *    each probe's top-k by raw dot product alongside the rank the
  *    classic augmented-space reduction assigns (append sqrt(M²−‖x‖²),
  *    rank by augmented cosine): the agreement column is the oracle-
  *    checked witness that the reduction preserves MIPS order. Same
  *    bounded shape as s7 — broadcast probes, min-k aggregates.
  */
object TextOps7 {
  import Tables.t

  private val K = 10
  private val ProbeMod = 25
  private val MipsProbeMod = 100

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

    "d22_passage_dedup" -> ((spark, dir) => {
      val chunks = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 16)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk)-16, 8), " +
            "i -> array_join(slice(tk, i+1, 16), ' '))")).as("chunk"))
        .select(col("doc_id"), md5(col("chunk")).as("h"))
      val shared = chunks.groupBy("h")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
      val perDoc = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      val dupPer = chunks.join(shared.select("h"), Seq("h"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      perDoc.join(dupPer, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"))
        .withColumn("dup_ratio",
          round(col("n_dup").cast("double") / col("n_chunks"), 6))
        .withColumn("keep", col("dup_ratio") < 0.5)
        .orderBy("doc_id")
    }),

    "s8_mips" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("d2",
          graft.functions.VectorOps.dot(col("emb"), col("emb")))
      // corpus max squared norm — the augmentation constant (1 row)
      val m2 = e.agg(max("d2").as("m2"))
      val probes = e.filter(col("vec_id") % MipsProbeMod === 0)
        .select(col("vec_id").as("p_id"),
          concat(col("emb"), array(lit(0.0))).as("p_aug"), col("emb").as("p_emb"))
      // augment each corpus vector to constant norm sqrt(M2): MIPS order
      // becomes cosine order in the lifted space
      val neigh = e.crossJoin(broadcast(m2))
        .select(col("vec_id").as("n_id"), col("emb").as("n_emb"),
          concat(col("emb"),
            array(sqrt(greatest(col("m2") - col("d2"), lit(0.0))))).as("n_aug"))
      // scored is read by BOTH rank legs — persist once (the d4 recipe)
      val scored = neigh.crossJoin(broadcast(probes))
        .filter(col("n_id") =!= col("p_id"))
        .select(col("p_id"), col("n_id"),
          round(graft.functions.VectorOps.dot(col("p_emb"), col("n_emb")), 6)
            .as("dot"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_aug"), col("n_aug")), 6).as("augc"))
        .persist()
      scored.count()
      def ranks(score: String, rank: String) = scored
        .groupBy("p_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col(score)).as("neg"), col("n_id").as("id")), K).as("top"))
        .select(col("p_id"), posexplode(col("top")))
        .select(col("p_id"), col("col.id").as("n_id"),
          (col("pos") + 1).cast("int").as(rank))
      // both rank frames are bounded (probes × K rows) — broadcast them
      // so the assembly never shuffles the persisted score frame
      broadcast(ranks("dot", "rank_dot"))
        .join(scored.select("p_id", "n_id", "dot"), Seq("p_id", "n_id"))
        .join(broadcast(ranks("augc", "rank_aug")),
          Seq("p_id", "n_id"), "left")
        .select(col("p_id"), col("n_id"), col("dot"), col("rank_dot"),
          col("rank_aug"),
          coalesce(col("rank_aug") === col("rank_dot"), lit(false))
            .as("agree"))
        .orderBy("p_id", "rank_dot")
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

    "d22_passage_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |ch AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_slice(tk, i+1, i+16), ' ')) AS h
        |  FROM d, UNNEST(range(0, len(tk)-15, 8)) AS t(i)
        |  WHERE len(tk) >= 16),
        |shared AS (
        |  SELECT h FROM ch GROUP BY h
        |  HAVING count(DISTINCT doc_id) >= 2),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
        |  FROM ch GROUP BY 1),
        |dp AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
        |  FROM ch JOIN shared USING (h) GROUP BY 1)
        |SELECT doc_id, n_chunks, coalesce(n_dup, 0) AS n_dup,
        |  round(CAST(coalesce(n_dup, 0) AS DOUBLE) / n_chunks, 6)
        |    AS dup_ratio,
        |  round(CAST(coalesce(n_dup, 0) AS DOUBLE) / n_chunks, 6) < 0.5
        |    AS keep
        |FROM pd LEFT JOIN dp USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "s8_mips" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |en AS (
         |  SELECT vec_id, emb, list_dot_product(emb, emb) AS d2 FROM e),
         |m AS (SELECT max(d2) AS m2 FROM en),
         |p AS (
         |  SELECT vec_id AS p_id, emb AS p_emb,
         |    list_append(emb, 0.0) AS p_aug
         |  FROM en WHERE vec_id % $MipsProbeMod = 0),
         |n AS (
         |  SELECT vec_id AS n_id, emb AS n_emb,
         |    list_append(emb, sqrt(greatest(m2 - d2, 0.0))) AS n_aug
         |  FROM en CROSS JOIN m),
         |scored AS (
         |  SELECT p_id, n_id,
         |    round(list_dot_product(p_emb, n_emb), 6) AS dot,
         |    round(list_dot_product(p_aug, n_aug) /
         |      (sqrt(list_dot_product(p_aug, p_aug))
         |        * sqrt(list_dot_product(n_aug, n_aug))), 6) AS augc
         |  FROM n CROSS JOIN p WHERE n_id <> p_id),
         |rd AS (
         |  SELECT p_id, n_id, dot,
         |    CAST(row_number() OVER (PARTITION BY p_id
         |      ORDER BY dot DESC, n_id) AS INTEGER) AS rank_dot
         |  FROM scored QUALIFY rank_dot <= $K),
         |ra AS (
         |  SELECT p_id, n_id,
         |    CAST(row_number() OVER (PARTITION BY p_id
         |      ORDER BY augc DESC, n_id) AS INTEGER) AS rank_aug
         |  FROM scored QUALIFY rank_aug <= $K)
         |SELECT p_id, n_id, dot, rank_dot, rank_aug,
         |  coalesce(rank_aug = rank_dot, false) AS agree
         |FROM rd LEFT JOIN ra USING (p_id, n_id)
         |ORDER BY p_id, rank_dot""".stripMargin,
  )
}
