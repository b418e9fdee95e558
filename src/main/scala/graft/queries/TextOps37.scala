package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 71 dedup ops (SURVEY.md §2.4):
  *
  *  - d41: MinHash estimator-error audit — for every verified d4 pair,
  *    the sketch-side Jaccard estimate (matching signature components
  *    / 8) laid against the exact shingle Jaccard, with the absolute
  *    error. This is the calibration evidence behind choosing 8
  *    hashes / 4 bands: the same audit a production pipeline runs
  *    before trusting the sketch at a new threshold. Reuses the d3
  *    signature frame and the d4 pair output — no new quadratic work;
  *    the estimate is an exact rational (k/8) so the comparison is
  *    deterministic.
  */
object TextOps37 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d41_minhash_error" -> ((spark, dir) => {
      val sig = TextOps.queries("d3_minhash_sig")(spark, dir)
      val pairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
      val a = sig.select(col("doc_id").as("a_id") +:
        (0 until 8).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
      val b = sig.select(col("doc_id").as("b_id") +:
        (0 until 8).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
      val matches = (0 until 8)
        .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
        .reduce(_ + _)
      pairs.join(a, "a_id").join(b, "b_id")
        .select(col("a_id"), col("b_id"), col("jaccard"),
          matches.cast("long").as("n_matching"),
          (matches.cast("double") / 8.0).as("estimate"))
        .withColumn("abs_error",
          round(abs(col("estimate") - col("jaccard")), 6))
        .select("a_id", "b_id", "jaccard", "n_matching", "estimate",
          "abs_error")
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d41_minhash_error" -> {
      val matches = (0 until 8)
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH d41sig AS MATERIALIZED (
         |  SELECT * FROM (${TextOps.oracleSql("d3_minhash_sig")}) t),
         |d41pairs AS MATERIALIZED (
         |  SELECT a_id, b_id, jaccard
         |  FROM (${TextOps.oracleSql("d4_minhash_pairs")}) t)
         |SELECT p.a_id, p.b_id, p.jaccard,
         |  CAST($matches AS BIGINT) AS n_matching,
         |  CAST($matches AS DOUBLE) / 8.0 AS estimate,
         |  round(abs(CAST($matches AS DOUBLE) / 8.0 - p.jaccard), 6)
         |    AS abs_error
         |FROM d41pairs p
         |JOIN d41sig a ON p.a_id = a.doc_id
         |JOIN d41sig b ON p.b_id = b.doc_id
         |ORDER BY p.a_id, p.b_id""".stripMargin
    },
  )
}
