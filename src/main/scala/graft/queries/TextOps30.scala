package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 61 text ops (SURVEY.md §2.4):
  *
  *  - d38: SEMANTIC split leakage — d34's audit re-run over the d10
  *    embedding near-duplicate pairs instead of the lexical d4 set: a
  *    val/test document whose near-twin in EMBEDDING space sits in
  *    train leaks through paraphrase even when no 3-gram matches.
  *    Same deterministic md5-pack 8/1/1 split, same broadcastable
  *    contingency; the oracle wraps d10's full SQL. Together d34+d38
  *    cover both leakage modalities.
  */
object TextOps30 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d38_semantic_leakage" -> ((spark, dir) => {
      val pairs = TextOps2.queries("d10_embedding_lsh_pairs")(spark, dir)
        .select(col("a_id"), col("b_id"))
      val sp = t(spark, dir, "embeddings")
        .select(col("vec_id"),
          (graft.functions.Md5Pack(col("vec_id").cast("string")) % 10)
            .as("m"))
        .select(col("vec_id"),
          when(col("m") < 8, "train").when(col("m") === 8, "val")
            .otherwise("test").as("split"))
      val sa = sp.select(col("vec_id").as("a_id"), col("split").as("split_a"))
      val sb = sp.select(col("vec_id").as("b_id"), col("split").as("split_b"))
      pairs.join(broadcast(sa), "a_id").join(broadcast(sb), "b_id")
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leaky", col("split_a") =!= col("split_b"))
        .orderBy("split_a", "split_b")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d38_semantic_leakage" -> {
      val d10 = TextOps2.oracleSql("d10_embedding_lsh_pairs")
      s"""WITH pairs AS MATERIALIZED ($d10),
         |sp AS (
         |  SELECT vec_id,
         |    CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (SELECT vec_id,
         |    ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")} % 10 AS m
         |  FROM embeddings))
         |SELECT sa.split AS split_a, sb.split AS split_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  sa.split <> sb.split AS leaky
         |FROM pairs
         |JOIN sp sa ON a_id = sa.vec_id
         |JOIN sp sb ON b_id = sb.vec_id
         |GROUP BY 1, 2, 4
         |ORDER BY 1, 2""".stripMargin
    },
  )
}
