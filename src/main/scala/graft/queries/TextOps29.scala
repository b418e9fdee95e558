package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 58 (SURVEY.md §2.4):
  *
  *  - s23: IVF inverted-list balance audit — the index-health metric
  *    that explains s22's recall curve: skewed list sizes mean some
  *    probes search huge lists (slow) while vectors in small lists
  *    are rarely reached (low recall). Reports list-count, size
  *    extremes, the max/mean imbalance factor and the coefficient of
  *    variation, all from exact integer list sizes (floats only in
  *    the final ratios). The oracle replays the same build+assign as
  *    s3/s22.
  */
object TextOps29 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s23_ivf_balance" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
      val cent = graft.operators.AnnIvf.buildCentroids(
        e, "vec_id", "embedding", nCentroids = 16, lloydIters = 1)
      val sizes = graft.operators.AnnIvf.assign(
          e.filter(col("embedding").isNotNull), cent,
          "vec_id", "embedding", nearest = 1)
        .groupBy("centroid_id").agg(count(lit(1)).as("c"))
      sizes.agg(
          count(lit(1)).as("n_lists"),
          sum(col("c")).cast("long").as("n_vecs"),
          min(col("c")).as("min_size"), max(col("c")).as("max_size"),
          sum(col("c") * col("c")).cast("decimal(38,0)").as("c2"))
        .select(col("n_lists"), col("n_vecs"), col("min_size"),
          col("max_size"),
          round(col("max_size").cast("double") * col("n_lists").cast("double")
            / col("n_vecs").cast("double"), 4).as("imbalance"),
          // cv = sqrt(n·Σc² − (Σc)²) / Σc  (population, ×√n cancels)
          round(sqrt((col("n_lists") * col("c2")
            - col("n_vecs") * col("n_vecs")).cast("double"))
            / col("n_vecs").cast("double"), 6).as("cv"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s23_ivf_balance" -> {
      val cosOf = (a: String, b: String) =>
        s"""list_dot_product($a, $b) /
           |      (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
      s"""WITH vecs AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |cent AS MATERIALIZED (
         |  SELECT vec_id AS centroid_id, emb AS c_emb
         |  FROM vecs
         |  ORDER BY ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")} LIMIT 16),
         |assigned0 AS MATERIALIZED (
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
         |rcent AS MATERIALIZED (
         |  SELECT centroid_id, list(m ORDER BY pos) AS c_emb
         |  FROM refined GROUP BY centroid_id),
         |assigned AS MATERIALIZED (
         |  SELECT v.vec_id, c.centroid_id,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosOf("v.emb", "c.c_emb")} DESC, c.centroid_id) AS rn
         |  FROM vecs v CROSS JOIN rcent c),
         |sizes AS (
         |  SELECT centroid_id, CAST(count(*) AS BIGINT) AS c
         |  FROM assigned WHERE rn = 1 GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_lists,
         |  CAST(sum(c) AS BIGINT) AS n_vecs,
         |  CAST(min(c) AS BIGINT) AS min_size,
         |  CAST(max(c) AS BIGINT) AS max_size,
         |  round(CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
         |    / CAST(sum(c) AS DOUBLE), 4) AS imbalance,
         |  round(sqrt(CAST(count(*) * CAST(sum(CAST(c * c AS DECIMAL(38,0)))
         |        AS DECIMAL(38,0))
         |      - CAST(sum(c) AS DECIMAL(38,0)) * CAST(sum(c)
         |        AS DECIMAL(38,0)) AS DOUBLE))
         |    / CAST(sum(c) AS DOUBLE), 6) AS cv
         |FROM sizes""".stripMargin
    },
  )
}
