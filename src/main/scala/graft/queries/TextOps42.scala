package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 82 dedup/mixing ops (SURVEY.md §2.4):
  *
  *  - d42: deterministic source-interleaved training order — the data
  *    mixing op that decides WHAT ORDER a trainer sees examples in:
  *    every document gets a fractional position (2·rank−1)/(2·n) inside
  *    its source (rank = md5 shuffle, so the within-source order is
  *    unbiased but reproducible), and merging all sources by that key
  *    yields a stream where each source appears proportionally to its
  *    size — the low-discrepancy interleave. The head of the stream is
  *    fetched as a distributed top-k (TakeOrderedAndProject — no
  *    global sort), then ranked inside the tiny fetched frame.
  */
object TextOps42 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d42_mix_order" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("source"))
      val wSrc = Window.partitionBy("source")
        .orderBy(graft.functions.Md5Pack(col("doc_id").cast("string")),
          col("doc_id"))
      val sizes = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      val keyed = docs
        .withColumn("r", row_number().over(wSrc))
        .join(broadcast(sizes), "source")
        .withColumn("k",
          round((lit(2) * col("r") - 1).cast("double")
            / (lit(2) * col("n_s")).cast("double"), 12))
      val head = keyed
        .orderBy(col("k"), col("source"), col("doc_id"))
        .limit(100)
      val wPos = Window.orderBy(col("k"), col("source"), col("doc_id"))
      head.withColumn("pos", row_number().over(wPos))
        .select(col("pos"), col("doc_id"), col("source"), col("k"))
        .orderBy("pos")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d42_mix_order" -> {
      val h = Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)")
      s"""WITH ranked AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ($h), doc_id) AS r,
         |    count(*) OVER (PARTITION BY source) AS n_s
         |  FROM documents),
         |keyed AS (
         |  SELECT doc_id, source,
         |    round(CAST(2 * r - 1 AS DOUBLE) / (2 * n_s), 12) AS k
         |  FROM ranked)
         |SELECT CAST(pos AS INTEGER) AS pos, doc_id, source, k
         |FROM (
         |  SELECT *, row_number() OVER (ORDER BY k, source, doc_id) AS pos
         |  FROM keyed)
         |WHERE pos <= 100 ORDER BY pos""".stripMargin
    },
  )
}
