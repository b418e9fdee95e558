package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 117b (SURVEY.md §2.4):
  *
  *  - s33: simplified (centroid-based) silhouette score for the s32
  *    clustering — the clustering-quality audit: per vector, a = the
  *    distance to its own centroid and b = the distance to the nearest
  *    OTHER centroid, s = (b−a)/max(a,b). The classic silhouette's
  *    all-pairs distances are quadratic; the centroid form is the
  *    standard linear-scale substitute (one broadcast of the k-row
  *    centroid frame, one pass). Distances run in IEEE doubles over
  *    the same quantized inputs in both engines (identically rendered
  *    left-associated sums), per-vector scores round→DECIMAL before
  *    the order-free mean.
  */
object TextOps56 {
  import Tables.t

  private val D = 8

  private def d2Sql(prefix: String): String =
    (0 until D).map(i => s"(xd_$i - ${prefix}c_$i) * (xd_$i - ${prefix}c_$i)")
      .mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s33_silhouette" -> ((spark, dir) => {
      val cents = TextOps55.queries("s32_kmeans")(spark, dir)
        .select(col("cid") +: (0 until D).map(i => col(s"c_$i")): _*)
      val emb = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id") +: (0 until D).map(i => expr(
          s"CAST(round(CAST(embedding[$i] AS DOUBLE), 8) AS DOUBLE)")
          .as(s"xd_$i")): _*)
      // One broadcast of the k-row centroid frame; the (d², cid) pairs
      // collapse per vector through two bounded min-k aggregates (own
      // centroid = argmin overall; nearest other = the second smallest).
      val scored = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"), expr(d2Sql("")).as("d2"))
        .groupBy("vec_id")
        .agg(graft.functions.TopKAgg.minK(
          struct(col("d2"), col("cid")), 2).as("w"))
        .select(col("vec_id"),
          col("w")(0)("cid").as("cid"),
          sqrt(col("w")(0)("d2")).as("a"),
          sqrt(col("w")(1)("d2")).as("b"))
        .withColumn("s", expr(
          "cast(round((b - a) / greatest(a, b), 9) as decimal(18,9))"))
      scored.groupBy("cid")
        .agg(count(lit(1)).as("n_vec"),
          sum(col("s")).as("ssum"))
        .select(col("cid"), col("n_vec"),
          round(col("ssum").cast("double") / col("n_vec"), 6)
            .as("mean_silhouette"))
        .orderBy("cid")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s33_silhouette" -> {
      val embCols = (0 until D).map(i =>
        s"CAST(round(CAST(embedding[${i + 1}] AS DOUBLE), 8) AS DOUBLE) " +
          s"AS xd_$i").mkString(", ")
      s"""
      WITH cents AS MATERIALIZED (
        SELECT cid, ${(0 until D).map(i => s"c_$i").mkString(", ")}
        FROM (${TextOps55.oracleSql("s32_kmeans")})),
      emb AS (
        SELECT vec_id, $embCols
        FROM embeddings WHERE embedding IS NOT NULL),
      dists AS (
        SELECT vec_id, cid, ${d2Sql("")} AS d2,
          row_number() OVER (PARTITION BY vec_id
            ORDER BY ${d2Sql("")}, cid) AS rn
        FROM emb CROSS JOIN cents),
      scored AS (
        SELECT o.vec_id, o.cid,
          CAST(round((sqrt(s.d2) - sqrt(o.d2))
            / greatest(sqrt(o.d2), sqrt(s.d2)), 9) AS DECIMAL(18,9)) AS s
        FROM dists o JOIN dists s
          ON o.vec_id = s.vec_id AND o.rn = 1 AND s.rn = 2)
      SELECT cid, CAST(count(*) AS BIGINT) AS n_vec,
        round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS mean_silhouette
      FROM scored GROUP BY cid ORDER BY cid"""
    },
  )
}
