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
      // median rank via the distributed prefix scan (row_number over the
      // whole corpus would sort every document through one task), and
      // the 20 boundary docs via the bounded min-k aggregate (ships at
      // most 20 rows per map partition — no second global sort)
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        scored.withColumn("one", lit(1L)),
        struct(col("ttr"), col("doc_id")), "one", "rn")
      val n = scored.agg(count(lit(1)).as("n"))
      val median = ranked.crossJoin(broadcast(n))
        .filter(col("rn") === ceil(col("n") / 2))
        .select(col("ttr").as("med"))
      scored.crossJoin(broadcast(median))
        .withColumn("dist", abs(col("ttr") - col("med")))
        .agg(graft.functions.TopKAgg.minK(
          struct(col("dist"), col("doc_id"), col("ttr"), col("med")), 20)
          .as("w"))
        .select(posexplode(col("w")).as(Seq("pos", "m")))
        .select((col("pos") + 1).cast("int").as("pick"),
          col("m.doc_id").as("doc_id"),
          col("m.ttr").cast("double").as("ttr"),
          col("m.med").cast("double").as("med"),
          col("m.dist").cast("double").as("dist"))
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
