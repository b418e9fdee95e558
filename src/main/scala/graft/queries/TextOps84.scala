package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Round-9 additions, batch 84 (SURVEY.md §2.4) — semantic dedup:
  *
  *  - d64: SEMDEDUP — embedding-space semantic deduplication (Abbas et
  *    al. 2023, the curation step between exact/MinHash dedup and
  *    model training): k-means-cluster the corpus embeddings, compare
  *    pairs ONLY within a cluster, and drop every vector that has a
  *    smaller-id cluster-mate above the cosine threshold (keep-first —
  *    the paper keeps one representative per semantic-duplicate group;
  *    the anchor choice is policy). Output: per-cluster census (size,
  *    dropped, kept) plus corpus totals.
  *
  *    Reuses the s3 IVF machinery wholesale: md5-deterministic centroid
  *    sample + one decimal-summed Lloyd round ([[graft.operators.AnnIvf]]),
  *    so the clustering — and with it the whole dedup decision —
  *    replays bit-identically in DuckDB.
  *
  *    Scale shape: clustering is the SemDeDup trick — pairwise cosine
  *    runs per cluster (corpus/k rows each), never corpus×corpus. The
  *    pair join is centroid-keyed; at 100 TB you additionally cap
  *    cluster size (the d39 skew-cap device) or compare in PQ space
  *    (s5) — the shape stays bucketed either way.
  */
object TextOps84 {
  import Tables.t

  private val K = 16 // clusters (the s3 centroid count)
  private val Tau = 0.3 // semantic-duplicate cosine threshold

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d64_semdedup" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"))
      val cent = graft.operators.AnnIvf.buildCentroids(
        e, "vec_id", "embedding", nCentroids = K, lloydIters = 1)
      val member = graft.operators.AnnIvf
        .assign(e, cent, "vec_id", "embedding", nearest = 1)
        .join(e, "vec_id")
        .persist() // feeds the pair join twice and the census
      val a = member.select(col("centroid_id"), col("vec_id").as("u"),
        col("embedding").as("ue"))
      val b = member.select(col("centroid_id").as("c2"),
        col("vec_id").as("v"), col("embedding").as("ve"))
      // within-cluster pairs only; keep-first policy drops the larger id
      val dropped = a.join(b,
          col("centroid_id") === col("c2") && col("u") < col("v"))
        .filter(round(VectorOps.cosine(col("ue"), col("ve")), 6) >= Tau)
        .select(col("centroid_id"), col("v")).distinct()
      val census = member.groupBy("centroid_id")
        .agg(count(lit(1)).as("n_vecs"))
        .join(dropped.groupBy("centroid_id")
          .agg(count(lit(1)).as("n_dropped")), Seq("centroid_id"), "left")
        .na.fill(0L, Seq("n_dropped"))
        .select(col("centroid_id"), col("n_vecs"), col("n_dropped"),
          (col("n_vecs") - col("n_dropped")).as("n_kept"))
        .persist()
      val totals = census.agg(
        sum(col("n_vecs")).as("total_vecs"),
        sum(col("n_dropped")).as("total_dropped"),
        sum(col("n_kept")).as("total_kept"))
      census.crossJoin(broadcast(totals)).orderBy("centroid_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the full SemDeDup replay: the s3 IVF chain (md5 centroid sample,
    // one decimal-summed Lloyd round, rn=1 assignment) + within-cluster
    // keep-first drops
    "d64_semdedup" -> {
      val cosOf = (x: String, y: String) =>
        s"""list_dot_product($x, $y) /
           |      (sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y)))""".stripMargin
      s"""WITH vecs AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |cent AS (
         |  SELECT vec_id AS centroid_id, emb AS c_emb
         |  FROM vecs
         |  ORDER BY ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")} LIMIT $K),
         |assigned0 AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC, c.centroid_id) AS rn
         |  FROM vecs v CROSS JOIN cent c),
         |memc AS (
         |  SELECT a.centroid_id,
         |    unnest(range(1, len(v.emb) + 1)) AS pos,
         |    unnest(v.emb) AS comp
         |  FROM assigned0 a JOIN vecs v ON a.vec_id = v.vec_id
         |  WHERE a.rn = 1),
         |refined AS (
         |  SELECT centroid_id, pos,
         |    round(CAST(sum(CAST(comp AS DECIMAL(25,10))) AS DOUBLE)
         |      / count(*), 6) AS m
         |  FROM memc GROUP BY centroid_id, pos),
         |rcent AS (
         |  SELECT centroid_id, list(m ORDER BY pos) AS c_emb
         |  FROM refined GROUP BY centroid_id),
         |assigned AS (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC, c.centroid_id) AS rn
         |  FROM vecs v CROSS JOIN rcent c),
         |mem AS (
         |  SELECT a.vec_id, a.centroid_id, v.emb
         |  FROM assigned a JOIN vecs v ON a.vec_id = v.vec_id
         |  WHERE a.rn = 1),
         |dropped AS (
         |  SELECT DISTINCT m1.centroid_id, m2.vec_id AS v
         |  FROM mem m1 JOIN mem m2
         |    ON m1.centroid_id = m2.centroid_id AND m1.vec_id < m2.vec_id
         |  WHERE round(${cosOf("m1.emb", "m2.emb")}, 6) >= $Tau),
         |pc AS (
         |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_vecs
         |  FROM mem GROUP BY 1),
         |dc AS (
         |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_dropped
         |  FROM dropped GROUP BY 1),
         |census AS (
         |  SELECT pc.centroid_id, pc.n_vecs,
         |    coalesce(dc.n_dropped, 0) AS n_dropped,
         |    pc.n_vecs - coalesce(dc.n_dropped, 0) AS n_kept
         |  FROM pc LEFT JOIN dc ON pc.centroid_id = dc.centroid_id),
         |tot AS (
         |  SELECT CAST(sum(n_vecs) AS BIGINT) AS total_vecs,
         |    CAST(sum(n_dropped) AS BIGINT) AS total_dropped,
         |    CAST(sum(n_kept) AS BIGINT) AS total_kept
         |  FROM census)
         |SELECT c.centroid_id, c.n_vecs, c.n_dropped, c.n_kept,
         |  t.total_vecs, t.total_dropped, t.total_kept
         |FROM census c, tot t
         |ORDER BY c.centroid_id""".stripMargin
    },
  )
}
