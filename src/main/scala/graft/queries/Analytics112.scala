package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 129 (SURVEY.md §2.4 statistics):
  *
  *  - q296: Fleiss' kappa — multi-rater agreement (3 deterministic
  *    raters bucketing each document by chars / words / distinct
  *    words into 3 size categories). The multi-annotator
  *    generalization of q295's Cohen kappa, i.e. the QC statistic for
  *    crowd-labeled training data. Per-subject agreement P_i has an
  *    integer numerator (Σ_j n_ij² − 3, over 6), so everything up to
  *    the final kappa is exact integer/decimal arithmetic; category
  *    marginal squares go through DECIMAL(38,0).
  *
  *  - q297: Welch's unequal-variance t-test — URGENT vs LOW order
  *    totals. Group moments are exact (prices as DECIMAL(18,2),
  *    squares rounded to DECIMAL(38,4) in one deterministic step);
  *    t statistic and Welch–Satterthwaite df are single double
  *    expressions over those exact moments. One scan, one 2-group
  *    aggregate — the map-side-combinable shape at any scale.
  */
object Analytics112 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q296_fleiss_kappa" -> ((spark, dir) => {
      val votes = t(spark, dir, "documents")
        .filter(col("text").isNotNull && col("n_chars").isNotNull)
        .select(col("doc_id"),
          when(col("n_chars") < 200, 0).when(col("n_chars") < 380, 1)
            .otherwise(2).as("r1"),
          when(size(split(col("text"), " ")) < 35, 0)
            .when(size(split(col("text"), " ")) < 70, 1)
            .otherwise(2).as("r2"),
          when(size(array_distinct(split(col("text"), " "))) < 20, 0)
            .when(size(array_distinct(split(col("text"), " "))) < 27, 1)
            .otherwise(2).as("r3"))
      val long = votes.select(col("doc_id"),
        explode(array(col("r1"), col("r2"), col("r3"))).as("cat"))
      val nij = long.groupBy("doc_id", "cat").agg(count(lit(1)).as("c"))
      // Σ_j n_ij² − 3 per doc (n=3 raters): 3·P_i·6 stays integer
      val pnum = nij.groupBy("doc_id")
        .agg((sum(col("c") * col("c")) - 3L).as("pn"))
        .agg(sum(col("pn")).as("sumpn"), count(lit(1)).as("nd"))
      val cj = long.groupBy("cat").agg(count(lit(1)).as("cj"))
        .agg(sum(expr("cast(cj * cj as decimal(38,0))")).as("sumc2"))
      pnum.crossJoin(cj).select(col("nd").as("n_docs"),
          round(expr("sumpn / (6.0d * nd)"), 6).as("pbar"),
          round(expr("cast(sumc2 as double) / (9.0d * nd * nd)"), 6)
            .as("pe"),
          round(expr(
            """(sumpn / (6.0d * nd)
              |  - cast(sumc2 as double) / (9.0d * nd * nd))
              | / (1.0d - cast(sumc2 as double) / (9.0d * nd * nd))"""
              .stripMargin), 6).as("kappa"))
    }),

    "q297_welch_ttest" -> ((spark, dir) => {
      val g = t(spark, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
            .as("grp"),
          expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("v"),
          expr("cast(round(o_totalprice * o_totalprice, 4) " +
            "as decimal(38,4))").as("v2"))
      val m = g.groupBy("grp").agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"), sum(col("v2")).as("ss"))
      val wide = m.agg(
        max(when(col("grp") === 1, col("n"))).as("n1"),
        max(when(col("grp") === 1, col("s"))).as("s1"),
        max(when(col("grp") === 1, col("ss"))).as("ss1"),
        max(when(col("grp") === 0, col("n"))).as("n0"),
        max(when(col("grp") === 0, col("s"))).as("s0"),
        max(when(col("grp") === 0, col("ss"))).as("ss0"))
      wide.selectExpr("n1", "n0",
          """round(cast(s1 as double) / n1
            |  - cast(s0 as double) / n0, 6) as mean_diff""".stripMargin,
          // pooled-free Welch t over exact moments
          """round((cast(s1 as double) / n1 - cast(s0 as double) / n0)
            | / sqrt(
            |   ((cast(ss1 as double) - n1 * (cast(s1 as double) / n1)
            |       * (cast(s1 as double) / n1)) / (n1 - 1)) / n1
            | + ((cast(ss0 as double) - n0 * (cast(s0 as double) / n0)
            |       * (cast(s0 as double) / n0)) / (n0 - 1)) / n0), 6)
            | as t_stat""".stripMargin,
          """round(
            | pow(((cast(ss1 as double) - n1 * (cast(s1 as double) / n1)
            |        * (cast(s1 as double) / n1)) / (n1 - 1)) / n1
            |   + ((cast(ss0 as double) - n0 * (cast(s0 as double) / n0)
            |        * (cast(s0 as double) / n0)) / (n0 - 1)) / n0, 2)
            | / (pow(((cast(ss1 as double) - n1 * (cast(s1 as double) / n1)
            |        * (cast(s1 as double) / n1)) / (n1 - 1)) / n1, 2)
            |     / (n1 - 1)
            |   + pow(((cast(ss0 as double) - n0 * (cast(s0 as double) / n0)
            |        * (cast(s0 as double) / n0)) / (n0 - 1)) / n0, 2)
            |     / (n0 - 1)), 6) as welch_df""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q296_fleiss_kappa" -> """
      WITH votes AS (
        SELECT doc_id,
          CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 380 THEN 1
            ELSE 2 END AS r1,
          CASE WHEN len(string_split(text, ' ')) < 35 THEN 0
            WHEN len(string_split(text, ' ')) < 70 THEN 1 ELSE 2 END AS r2,
          CASE WHEN len(list_distinct(string_split(text, ' '))) < 20 THEN 0
            WHEN len(list_distinct(string_split(text, ' '))) < 27 THEN 1
            ELSE 2 END AS r3
        FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      longf AS (
        SELECT doc_id, unnest([r1, r2, r3]) AS cat FROM votes),
      nij AS (
        SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
        FROM longf GROUP BY doc_id, cat),
      pnum AS (
        SELECT CAST(sum(pn) AS BIGINT) AS sumpn,
          CAST(count(*) AS BIGINT) AS nd
        FROM (SELECT doc_id, sum(c * c) - 3 AS pn FROM nij
              GROUP BY doc_id) x),
      cj AS (
        SELECT sum(CAST(cj * cj AS DECIMAL(38,0))) AS sumc2
        FROM (SELECT cat, CAST(count(*) AS BIGINT) AS cj FROM longf
              GROUP BY cat) y)
      SELECT nd AS n_docs,
        round(sumpn / (6.0 * nd), 6) AS pbar,
        round(CAST(sumc2 AS DOUBLE) / (9.0 * nd * nd), 6) AS pe,
        round((sumpn / (6.0 * nd)
            - CAST(sumc2 AS DOUBLE) / (9.0 * nd * nd))
          / (1.0 - CAST(sumc2 AS DOUBLE) / (9.0 * nd * nd)), 6) AS kappa
      FROM pnum CROSS JOIN cj""",

    "q297_welch_ttest" -> """
      WITH g AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            AS grp,
          CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS v,
          CAST(round(o_totalprice * o_totalprice, 4) AS DECIMAL(38,4))
            AS v2
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      m AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n, sum(v) AS s,
          sum(v2) AS ss
        FROM g GROUP BY grp),
      wide AS (
        SELECT
          max(CASE WHEN grp = 1 THEN n END) AS n1,
          max(CASE WHEN grp = 1 THEN s END) AS s1,
          max(CASE WHEN grp = 1 THEN ss END) AS ss1,
          max(CASE WHEN grp = 0 THEN n END) AS n0,
          max(CASE WHEN grp = 0 THEN s END) AS s0,
          max(CASE WHEN grp = 0 THEN ss END) AS ss0
        FROM m)
      SELECT n1, n0,
        round(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0, 6)
          AS mean_diff,
        round((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
          / sqrt(
            ((CAST(ss1 AS DOUBLE) - n1 * (CAST(s1 AS DOUBLE) / n1)
                * (CAST(s1 AS DOUBLE) / n1)) / (n1 - 1)) / n1
          + ((CAST(ss0 AS DOUBLE) - n0 * (CAST(s0 AS DOUBLE) / n0)
                * (CAST(s0 AS DOUBLE) / n0)) / (n0 - 1)) / n0), 6)
          AS t_stat,
        round(
          pow(((CAST(ss1 AS DOUBLE) - n1 * (CAST(s1 AS DOUBLE) / n1)
                * (CAST(s1 AS DOUBLE) / n1)) / (n1 - 1)) / n1
            + ((CAST(ss0 AS DOUBLE) - n0 * (CAST(s0 AS DOUBLE) / n0)
                * (CAST(s0 AS DOUBLE) / n0)) / (n0 - 1)) / n0, 2)
          / (pow(((CAST(ss1 AS DOUBLE) - n1 * (CAST(s1 AS DOUBLE) / n1)
                * (CAST(s1 AS DOUBLE) / n1)) / (n1 - 1)) / n1, 2)
              / (n1 - 1)
            + pow(((CAST(ss0 AS DOUBLE) - n0 * (CAST(s0 AS DOUBLE) / n0)
                * (CAST(s0 AS DOUBLE) / n0)) / (n0 - 1)) / n0, 2)
              / (n0 - 1)), 6) AS welch_df
      FROM wide""",
  )
}
