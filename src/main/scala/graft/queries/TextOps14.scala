package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 30 (dedup family, SURVEY.md §2.4):
  *
  *  - d28: golden-record survivorship — the master-data-management step
  *    that follows clustering: per d8 connected component, elect the
  *    canonical attributes under explicit survivorship rules (longest
  *    text wins the canonical document, lowest-numbered source wins
  *    provenance, ties broken by doc_id). Both elections pack
  *    (priority, tiebreak) into a single integer argmin/argmax key —
  *    the d12 device, clamped so the key can never overflow Long — so
  *    Spark's max_by and DuckDB's arg_max pick identical winners even
  *    though neither engine defines tie behavior. One groupBy over the
  *    cluster label; the heavy lifting (minhash → LSH → components) is
  *    the d4/d8 pipeline it composes.
  */
object TextOps14 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d28_golden_record" -> ((spark, dir) => {
      val clusters = queriesD8(spark, dir)
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("source"),
          substring(col("source"), 4, 10).cast("long").as("srank"))
      clusters.join(docs, "doc_id")
        .groupBy(col("cluster_keeper"))
        .agg(
          count(lit(1)).as("n_members"),
          max_by(col("doc_id"),
            least(col("n_chars"), lit(1000000L)) * lit(1000000000000L)
              - col("doc_id")).as("canonical_doc"),
          min_by(col("source"),
            col("srank") * lit(1000000000000L) + col("doc_id"))
            .as("best_source"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("cluster_keeper")
    }),
  )

  private def queriesD8(spark: SparkSession, dir: String): DataFrame =
    TextOps.queries("d8_dedup_clusters")(spark, dir)

  val oracleSql: Map[String, String] = Map(
    "d28_golden_record" -> {
      val d8 = TextOps.oracleSql("d8_dedup_clusters")
      s"""WITH clusters AS ($d8),
         |j AS (
         |  SELECT c.doc_id, c.cluster_keeper, d.n_chars, d.source,
         |    CAST(substr(d.source, 4) AS BIGINT) AS srank
         |  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id)
         |SELECT cluster_keeper, CAST(count(*) AS BIGINT) AS n_members,
         |  arg_max(doc_id,
         |    least(n_chars, 1000000) * 1000000000000 - doc_id)
         |    AS canonical_doc,
         |  arg_min(source, srank * 1000000000000 + doc_id)
         |    AS best_source,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
