package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 93 text ops (SURVEY.md §2.4):
  *
  *  - d47: boundary (uncertainty) sampling — the labeling-budget
  *    allocator: when a filter's decision hinges on a score, human
  *    labels are worth most NEAR the decision boundary. The corpus
  *    median TTR (exact rank-selected) stands in for the boundary;
  *    the 20 documents closest to it (|ttr − median|, doc_id
  *    tie-break) form the labeling batch. Distances compare as exact
  *    6dp decimals — no float ordering ambiguity.
  */
object TextOps49 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d47_boundary_sampling" -> ((spark, dir) => {
      val tk = split(col("text"), " ")
      val scored = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          when(size(tk) > 0,
            round(size(array_distinct(tk)).cast("double")
              / size(tk).cast("double"), 6))
            .otherwise(0.0).cast("decimal(10,6)").as("ttr"))
      val w = Window.orderBy(col("ttr"), col("doc_id"))
      val ranked = scored.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))))
      val median = ranked.filter(col("rn") === ceil(col("n") / 2))
        .select(col("ttr").as("med"))
      val w2 = Window.orderBy(col("dist"), col("doc_id"))
      scored.crossJoin(broadcast(median))
        .withColumn("dist", abs(col("ttr") - col("med")))
        .withColumn("pick", row_number().over(w2))
        .filter(col("pick") <= 20)
        .select(col("pick"), col("doc_id"),
          col("ttr").cast("double").as("ttr"),
          col("med").cast("double").as("med"),
          col("dist").cast("double").as("dist"))
        .orderBy("pick")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d47_boundary_sampling" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(string_split(text, ' ')) > 0 THEN
        |      round(CAST(len(list_distinct(string_split(text, ' ')))
        |        AS DOUBLE) / len(string_split(text, ' ')), 6)
        |    ELSE 0.0 END AS DECIMAL(10,6)) AS ttr
        |  FROM documents WHERE text IS NOT NULL),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY ttr, doc_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM scored),
        |med AS (
        |  SELECT ttr AS med FROM ranked WHERE rn = ceil(n / 2.0))
        |SELECT CAST(pick AS INTEGER) AS pick, doc_id,
        |  CAST(ttr AS DOUBLE) AS ttr, CAST(med AS DOUBLE) AS med,
        |  CAST(dist AS DOUBLE) AS dist
        |FROM (
        |  SELECT s.doc_id, s.ttr, m.med, abs(s.ttr - m.med) AS dist,
        |    row_number() OVER (ORDER BY abs(s.ttr - m.med), s.doc_id)
        |      AS pick
        |  FROM scored s CROSS JOIN med m)
        |WHERE pick <= 20 ORDER BY pick""".stripMargin,
  )
}
