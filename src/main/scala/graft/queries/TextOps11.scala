package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 16 (SURVEY.md §2.4):
  *
  *  - t27: skip-gram PMI — t12's collocation mining widened to the
  *    word2vec-style ±2 context window: directed (w1, w2) pairs at gap
  *    1 and 2 come from two lead() passes over the SAME doc-keyed
  *    window (no positional self-join), then the t12 PMI float device
  *    verbatim. Unigram/total joins broadcast vocabulary-bounded
  *    frames only.
  *  - s13: triplet mining — the contrastive-training data op: for each
  *    probe, the hardest positive (highest-cosine same-label neighbor)
  *    and hardest negative (highest-cosine different-label neighbor),
  *    with the margin computed in exact DECIMAL(9,6) from the
  *    rounded-6 cosines (the s12 device — re-rounding a derived float
  *    lands on .5-ulp boundaries). Arg-maxes run through the bounded
  *    min-k aggregate; probes are a bounded slice broadcast against
  *    one corpus scan.
  */
object TextOps11 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t27_skipgram_pmi" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("term"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val lead1 = tok.select(col("term").as("w1"),
        lead(col("term"), 1).over(w).as("w2"))
      val lead2 = tok.select(col("term").as("w1"),
        lead(col("term"), 2).over(w).as("w2"))
      val sg = lead1.unionByName(lead2).filter(col("w2").isNotNull)
        .groupBy("w1", "w2").agg(count(lit(1)).as("cnt_p"))
      val uni = tok.groupBy("term").agg(count(lit(1)).as("cnt_u"))
      val totU = uni.agg(sum(col("cnt_u")).cast("long").as("total_u"))
      val totP = sg.agg(sum(col("cnt_p")).cast("long").as("total_p"))
      sg.filter(col("cnt_p") >= 4)
        .join(broadcast(uni.select(col("term").as("w1"),
          col("cnt_u").as("cnt1"))), "w1")
        .join(broadcast(uni.select(col("term").as("w2"),
          col("cnt_u").as("cnt2"))), "w2")
        .crossJoin(broadcast(totU)).crossJoin(broadcast(totP))
        .select(col("w1"), col("w2"), col("cnt_p"),
          round(log(
            (col("cnt_p").cast("double") / col("total_p")) /
              ((col("cnt1").cast("double") / col("total_u")) *
                (col("cnt2").cast("double") / col("total_u")))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    "s13_triplet_mining" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("label"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
      val probes = e.filter(col("vec_id") % 50 === 1)
        .select(col("vec_id").as("p_id"), col("label").as("p_label"),
          col("emb").as("p_emb"))
      val scored = e.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id").as("n_id"),
          (col("label") === col("p_label")).as("same_label"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("emb")), 6).as("cos"))
      def best(df: DataFrame, idName: String, cosName: String) =
        df.groupBy("p_id")
          .agg(graft.functions.TopKAgg.minK(
            struct((-col("cos")).as("neg"), col("n_id").as("id")), 1).as("w"))
          .select(col("p_id"), col("w")(0)("id").as(idName),
            (-col("w")(0)("neg")).as(cosName))
      val pos = best(scored.filter(col("same_label")), "pos_id", "pos_cos")
      val neg = best(scored.filter(!col("same_label")), "neg_id", "neg_cos")
      pos.join(neg, "p_id")
        .select(col("p_id"), col("pos_id"), col("pos_cos"),
          col("neg_id"), col("neg_cos"),
          (col("pos_cos").cast("decimal(9,6)") -
            col("neg_cos").cast("decimal(9,6)")).cast("double").as("margin"))
        .orderBy("p_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t27_skipgram_pmi" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |tok AS (SELECT doc_id, unnest(tk) AS term FROM d),
        |sg1 AS (
        |  SELECT unnest(list_transform(range(len(tk)-1),
        |    i -> struct_pack(a := tk[i+1], b := tk[i+2]))) AS p
        |  FROM d),
        |sg2 AS (
        |  SELECT unnest(list_transform(range(len(tk)-2),
        |    i -> struct_pack(a := tk[i+1], b := tk[i+3]))) AS p
        |  FROM d),
        |sg AS (
        |  SELECT p.a AS w1, p.b AS w2, CAST(count(*) AS BIGINT) AS cnt_p
        |  FROM (SELECT p FROM sg1 UNION ALL SELECT p FROM sg2)
        |  GROUP BY 1, 2),
        |uni AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt_u
        |        FROM tok GROUP BY term),
        |tu AS (SELECT CAST(sum(cnt_u) AS BIGINT) AS total_u FROM uni),
        |tp AS (SELECT CAST(sum(cnt_p) AS BIGINT) AS total_p FROM sg)
        |SELECT w1, w2, cnt_p,
        |  round(ln(
        |    (CAST(cnt_p AS DOUBLE) / total_p) /
        |    ((CAST(u1.cnt_u AS DOUBLE) / total_u) *
        |     (CAST(u2.cnt_u AS DOUBLE) / total_u))), 6) AS pmi
        |FROM sg
        |JOIN uni u1 ON sg.w1 = u1.term
        |JOIN uni u2 ON sg.w2 = u2.term
        |CROSS JOIN tu CROSS JOIN tp
        |WHERE cnt_p >= 4
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,

    "s13_triplet_mining" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |p AS (SELECT vec_id AS p_id, label AS p_label, emb AS p_emb
        |      FROM e WHERE vec_id % 50 = 1),
        |scored AS (
        |  SELECT p_id, e.vec_id AS n_id, e.label = p_label AS same_label,
        |    round(list_dot_product(p_emb, e.emb) /
        |      (sqrt(list_dot_product(p_emb, p_emb))
        |        * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM e CROSS JOIN p WHERE e.vec_id <> p_id),
        |pos AS (
        |  SELECT p_id, n_id AS pos_id, cos AS pos_cos FROM (
        |    SELECT *, row_number() OVER (PARTITION BY p_id
        |      ORDER BY cos DESC, n_id) AS rn
        |    FROM scored WHERE same_label) WHERE rn = 1),
        |neg AS (
        |  SELECT p_id, n_id AS neg_id, cos AS neg_cos FROM (
        |    SELECT *, row_number() OVER (PARTITION BY p_id
        |      ORDER BY cos DESC, n_id) AS rn
        |    FROM scored WHERE NOT same_label) WHERE rn = 1)
        |SELECT p_id, pos_id, pos_cos, neg_id, neg_cos,
        |  CAST(CAST(pos_cos AS DECIMAL(9,6)) - CAST(neg_cos AS DECIMAL(9,6))
        |    AS DOUBLE) AS margin
        |FROM pos JOIN neg USING (p_id) ORDER BY p_id""".stripMargin,
  )
}
