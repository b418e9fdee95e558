package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 140 (SURVEY.md §2.4 similarity):
  *
  *  - s34: IVF + PQ composed — the production vector-store shape
  *    (FAISS IVFPQ): IVF routing restricts each probe to nProbe=2
  *    inverted lists (map-only centroid assignment, no shuffle), then
  *    candidates are ranked by PQ-RECONSTRUCTED L2 (m=32 subspaces)
  *    instead of exact dot products — at 100 TB the full-precision
  *    vectors never enter the query path: routing reads centroids,
  *    ranking reads 32-byte codes. Both stages reuse the existing
  *    operators (AnnIvf assignment, AnnPq reconstruction) and the
  *    whole pipeline — sampling, assignment, codebook, encode,
  *    reconstruction, ranking — replays in DuckDB.
  */
object TextOps61 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s34_ivf_pq" -> ((spark, dir) => {
      val raw = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
      val vecs = raw.select(col("vec_id"),
        graft.functions.GraftFunctions.l2Normalize(col("embedding"))
          .as("emb"))
      // IVF: md5-sampled 16 centroids from the RAW embeddings (the
      // operator collects float arrays); cosine assignment against the
      // normalized corpus is scale-invariant, and the oracle mirrors
      // the exact same normalized-vs-raw float ops
      val cent = graft.operators.AnnIvf
        .buildCentroids(raw, "vec_id", "embedding", 16, lloydIters = 0)
      val lists = graft.operators.AnnIvf
        .assign(vecs, cent, "vec_id", "emb", nearest = 1)
        .withColumnRenamed("vec_id", "cand_id")
      val routed = graft.operators.AnnIvf
        .assign(vecs.filter(col("vec_id") < 10), cent, "vec_id", "emb",
          nearest = 2)
        .withColumnRenamed("vec_id", "probe_id")
      // PQ: 16-codeword codebook from the md5-smallest ids (filter
      // BEFORE normalization work — the codebook action touches 16 rows)
      val cbIds = raw.select(col("vec_id"),
          graft.functions.Md5Pack(col("vec_id").cast("string")).as("_h"))
        .orderBy(col("_h"), col("vec_id")).limit(16)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val cb = graft.operators.AnnPq.codebook(
        vecs.filter(col("vec_id").isin(cbIds: _*)), "vec_id", "emb", 16)
      val recon = graft.operators.AnnPq
        .withReconstruction(vecs, "emb", cb, m = 32)
        .select(col("vec_id").as("cand_id"), col("recon"))
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("est_l2sq"), col("cand_id"))
      routed.join(lists, Seq("centroid_id"))
        .filter(col("probe_id") =!= col("cand_id"))
        .select("probe_id", "cand_id").distinct()
        .join(recon, "cand_id").join(broadcast(probes), "probe_id")
        .select(col("probe_id"), col("cand_id"),
          round(graft.operators.AnnPq.l2sq(col("p_emb"), col("recon")), 6)
            .as("est_l2sq"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("probe_id", "rank")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s34_ivf_pq" -> {
      val M = 32
      val Sub = 64 / M
      val cosOf = (a: String, b: String) =>
        s"""list_dot_product($a, $b) /
           |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
      val l2 = (a: String, b: String) =>
        s"list_dot_product($a, $a) - 2 * list_dot_product($a, $b) + list_dot_product($b, $b)"
      val encScore =
        "list_dot_product(cs, cs) - 2 * list_dot_product(vs, cs)"
      s"""WITH vecs0 AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |vecs AS (
         |  SELECT vec_id, list_transform(e0,
         |    x -> x / sqrt(list_dot_product(e0, e0))) AS emb
         |  FROM vecs0),
         |cent AS (
         |  SELECT vec_id AS centroid_id, e0 AS c_emb
         |  FROM vecs0
         |  ORDER BY ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")}
         |  LIMIT 16),
         |assigned AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC, c.centroid_id)
         |      AS rn
         |  FROM vecs v CROSS JOIN cent c),
         |lists AS (
         |  SELECT vec_id AS cand_id, centroid_id FROM assigned
         |  WHERE rn = 1),
         |routed AS (
         |  SELECT vec_id AS probe_id, centroid_id FROM assigned
         |  WHERE rn <= 2 AND vec_id < 10),
         |cb AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS k, emb
         |  FROM (
         |    SELECT vec_id, emb,
         |      ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")} AS h
         |    FROM vecs ORDER BY h, vec_id LIMIT 16)),
         |enc AS (
         |  SELECT vec_id, m, k, rn FROM (
         |    SELECT v.vec_id, s.m, c.k,
         |      row_number() OVER (PARTITION BY v.vec_id, s.m
         |        ORDER BY $encScore, c.k) AS rn
         |    FROM vecs v
         |    CROSS JOIN (SELECT unnest(range($M)) AS m) s
         |    CROSS JOIN cb c,
         |    LATERAL (SELECT list_slice(v.emb, CAST(s.m*$Sub+1 AS INTEGER),
         |        CAST(s.m*$Sub+$Sub AS INTEGER)) AS vs,
         |      list_slice(c.emb, CAST(s.m*$Sub+1 AS INTEGER),
         |        CAST(s.m*$Sub+$Sub AS INTEGER)) AS cs) x)
         |  WHERE rn = 1),
         |recon AS (
         |  SELECT e.vec_id,
         |    flatten(list(list_slice(c.emb, CAST(e.m*$Sub+1 AS INTEGER),
         |      CAST(e.m*$Sub+$Sub AS INTEGER)) ORDER BY e.m)) AS recon
         |  FROM enc e JOIN cb c ON c.k = e.k
         |  GROUP BY e.vec_id),
         |cands AS (
         |  SELECT DISTINCT r.probe_id, l.cand_id
         |  FROM routed r JOIN lists l ON r.centroid_id = l.centroid_id
         |  WHERE r.probe_id <> l.cand_id),
         |scored AS (
         |  SELECT c.probe_id, c.cand_id,
         |    round(${l2("p.emb", "rc.recon")}, 6) AS est_l2sq
         |  FROM cands c
         |  JOIN recon rc ON c.cand_id = rc.vec_id
         |  JOIN vecs p ON c.probe_id = p.vec_id)
         |SELECT probe_id, cand_id, est_l2sq, CAST(rn AS INTEGER) AS rank
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY est_l2sq, cand_id) AS rn
         |  FROM scored)
         |WHERE rn <= 5 ORDER BY probe_id, rank""".stripMargin
    },
  )
}
