package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 144 (SURVEY.md §2.4 evaluation):
  *
  *  - t55: multiclass Matthews correlation coefficient (the Rk
  *    statistic) of the t19 trigram language classifier — the single
  *    chance-corrected number for a full confusion matrix, robust to
  *    class imbalance where accuracy and per-class F1 (t53) are not.
  *    MCC = (c·s − Σ p_k t_k) / √((s² − Σp_k²)(s² − Σt_k²)), all
  *    terms integer (DECIMAL(38,0) products) off the k²-bounded
  *    matrix.
  */
object TextOps62 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t55_langid_mcc" -> ((spark, dir) => {
      val cm = TextOps4.queries("t19_trigram_langid")(spark, dir)
      val tot = cm.agg(sum(col("n")).as("s"),
        sum(when(col("true_lang") === col("pred_lang"), col("n"))
          .otherwise(0L)).as("c"))
      val pt = cm.groupBy("pred_lang").agg(sum(col("n")).as("pk"))
        .join(cm.groupBy("true_lang").agg(sum(col("n")).as("tk")),
          col("pred_lang") === col("true_lang"), "full_outer")
        .select(coalesce(col("pk"), lit(0L)).as("pk"),
          coalesce(col("tk"), lit(0L)).as("tk"))
        .agg(sum(expr("cast(pk as decimal(38,0)) * tk")).as("spt"),
          sum(expr("cast(pk as decimal(38,0)) * pk")).as("spp"),
          sum(expr("cast(tk as decimal(38,0)) * tk")).as("stt"))
      tot.crossJoin(pt).selectExpr("s", "c",
          """round((cast(c as double) * s - cast(spt as double))
            | / sqrt((cast(s as double) * s - cast(spp as double))
            |   * (cast(s as double) * s - cast(stt as double))), 6)
            | as mcc""".stripMargin)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t55_langid_mcc" -> s"""
      WITH cm AS (${TextOps4.oracleSql("t19_trigram_langid")}),
      tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS s,
          CAST(sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
            AS BIGINT) AS c
        FROM cm),
      pt AS (
        SELECT sum(CAST(pk AS DECIMAL(38,0)) * tk) AS spt,
          sum(CAST(pk AS DECIMAL(38,0)) * pk) AS spp,
          sum(CAST(tk AS DECIMAL(38,0)) * tk) AS stt
        FROM (
          SELECT coalesce(pk, 0) AS pk, coalesce(tk, 0) AS tk
          FROM (SELECT pred_lang, CAST(sum(n) AS BIGINT) AS pk FROM cm
                GROUP BY pred_lang) p
          FULL OUTER JOIN
            (SELECT true_lang, CAST(sum(n) AS BIGINT) AS tk FROM cm
             GROUP BY true_lang) t
            ON p.pred_lang = t.true_lang) u)
      SELECT s, c,
        round((CAST(c AS DOUBLE) * s - CAST(spt AS DOUBLE))
          / sqrt((CAST(s AS DOUBLE) * s - CAST(spp AS DOUBLE))
            * (CAST(s AS DOUBLE) * s - CAST(stt AS DOUBLE))), 6) AS mcc
      FROM tot CROSS JOIN pt""",
  )
}
