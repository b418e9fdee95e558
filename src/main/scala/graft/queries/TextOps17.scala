package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 37 (dedup family, SURVEY.md §2.4):
  *
  *  - d29: dedup funnel — the pipeline-observability rollup ops teams
  *    watch: how many documents survive each dedup tier (raw corpus →
  *    exact content-hash uniques → near-dup keep list), with each
  *    tier's removal count. Composes d1's hash and d12's keep list;
  *    the funnel frame itself is three scalar aggregates, so the cost
  *    is the tiers it measures, not the report.
  */
object TextOps17 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d29_dedup_funnel" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
      val raw = docs.agg(count(lit(1)).as("n"))
        .select(lit(0L).as("tier"), lit("raw").as("stage"), col("n"))
      val exact = docs
        .select(md5(lower(col("text"))).as("h"))
        .agg(count_distinct(col("h")).as("n"))
        .select(lit(1L).as("tier"), lit("exact_unique").as("stage"),
          col("n"))
      val kept = TextOps3.queries("d12_keep_list")(spark, dir)
        .agg(count_if(col("keep")).as("n"))
        .select(lit(2L).as("tier"), lit("neardup_kept").as("stage"),
          col("n"))
      raw.unionByName(exact).unionByName(kept)
        .withColumn("removed_vs_prev",
          coalesce(lag(col("n"), 1).over(
            org.apache.spark.sql.expressions.Window.orderBy("tier"))
            - col("n"), lit(0L)))
        .orderBy("tier")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d29_dedup_funnel" -> {
      val d12 = TextOps3.oracleSql("d12_keep_list")
      s"""WITH keep AS ($d12),
         |tiers AS (
         |  SELECT CAST(0 AS BIGINT) AS tier, 'raw' AS stage,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM documents
         |  UNION ALL
         |  SELECT 1, 'exact_unique',
         |    CAST(count(DISTINCT md5(lower(text))) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 2, 'neardup_kept',
         |    CAST(count(*) FILTER (WHERE keep) AS BIGINT)
         |  FROM keep)
         |SELECT tier, stage, n,
         |  coalesce(lag(n, 1) OVER (ORDER BY tier) - n, 0) AS
         |    removed_vs_prev
         |FROM tiers ORDER BY tier""".stripMargin
    },
  )
}
