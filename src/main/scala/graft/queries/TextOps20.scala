package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 43 (dedup family, SURVEY.md §2.4):
  *
  *  - d31: similarity-band histogram over d4's verified pairs — the
  *    threshold-sensitivity view an operator reads before tightening
  *    or loosening the dedup gate: how many candidate pairs sit in
  *    each 0.05-wide Jaccard band, with the band extremes. One pass
  *    over the (already bounded) verified-pair frame; both engines
  *    band the SAME doubles, so boundary pairs band identically.
  */
object TextOps20 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d31_pair_jaccard_bands" -> ((spark, dir) => {
      TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("jaccard"))
        .withColumn("band", floor(col("jaccard") * 20).cast("int"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_pairs"),
          round(min(col("jaccard")), 6).as("min_j"),
          round(max(col("jaccard")), 6).as("max_j"))
        .orderBy("band")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d31_pair_jaccard_bands" -> {
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      s"""WITH pairs AS (SELECT jaccard FROM ($d4))
         |SELECT CAST(floor(jaccard * 20) AS INT) AS band,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(min(jaccard), 6) AS min_j,
         |  round(max(jaccard), 6) AS max_j
         |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
