package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 67 dedup ops (SURVEY.md §2.4):
  *
  *  - d40: ensemble dedup vote — the precision move production dedup
  *    actually ships: a pair is dropped only when INDEPENDENT signals
  *    agree. The three pairwise detectors already in the engine
  *    (d4 MinHash+LSH set similarity, d5 SimHash bit similarity,
  *    d25 TF-IDF cosine) vote per pair; pairs with ≥2 votes become
  *    the high-confidence drop set, single-signal pairs stay for
  *    review. Cost is the three (already capped/bucketed) pipelines
  *    plus one groupBy over their union — no new quadratic work.
  */
object TextOps35 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d40_ensemble_votes" -> ((spark, dir) => {
      def leg(name: String, tag: String): DataFrame =
        (if (name.startsWith("d25"))
          TextOps12.queries(name)(spark, dir)
        else TextOps.queries(name)(spark, dir))
          .select(col("a_id"), col("b_id"), lit(tag).as("src"))
      leg("d4_minhash_pairs", "minhash")
        .unionByName(leg("d5_simhash_pairs", "simhash"))
        .unionByName(leg("d25_tfidf_cosine_pairs", "tfidf"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("votes"),
          max(when(col("src") === "minhash", 1).otherwise(0)).cast("boolean")
            .as("by_minhash"),
          max(when(col("src") === "simhash", 1).otherwise(0)).cast("boolean")
            .as("by_simhash"),
          max(when(col("src") === "tfidf", 1).otherwise(0)).cast("boolean")
            .as("by_tfidf"))
        .withColumn("drop_confident", col("votes") >= 2)
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d40_ensemble_votes" ->
      s"""WITH mh AS MATERIALIZED (
         |  SELECT a_id, b_id FROM (${TextOps.oracleSql("d4_minhash_pairs")}) t),
         |sh AS MATERIALIZED (
         |  SELECT a_id, b_id FROM (${TextOps.oracleSql("d5_simhash_pairs")}) t),
         |tf AS MATERIALIZED (
         |  SELECT a_id, b_id
         |  FROM (${TextOps12.oracleSql("d25_tfidf_cosine_pairs")}) t),
         |u AS (
         |  SELECT a_id, b_id, 'minhash' AS src FROM mh
         |  UNION ALL SELECT a_id, b_id, 'simhash' FROM sh
         |  UNION ALL SELECT a_id, b_id, 'tfidf' FROM tf)
         |SELECT a_id, b_id, CAST(count(*) AS BIGINT) AS votes,
         |  max(CASE WHEN src = 'minhash' THEN 1 ELSE 0 END) = 1 AS by_minhash,
         |  max(CASE WHEN src = 'simhash' THEN 1 ELSE 0 END) = 1 AS by_simhash,
         |  max(CASE WHEN src = 'tfidf' THEN 1 ELSE 0 END) = 1 AS by_tfidf,
         |  count(*) >= 2 AS drop_confident
         |FROM u GROUP BY 1, 2
         |ORDER BY a_id, b_id""".stripMargin,
  )
}
