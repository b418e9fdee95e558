package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 131 (SURVEY.md §2.4 text quality):
  *
  *  - t52: the Gopher document-quality rule set (Rae et al. 2021,
  *    "Scaling Language Models") re-expressed as pure integer Column
  *    predicates: word-count bounds, mean-word-length bounds (3n ≤
  *    Σlen ≤ 10n — no float division anywhere), alpha-word ratio
  *    (5·n_alpha ≥ 4·n), ≥2 distinct common-word hits, and
  *    symbol-to-word ratio (10·n_sym < n). Σlen falls out of the
  *    single-space invariant (len(text) − n + 1), so the whole filter
  *    is one map-only projection — the shape a 100 TB quality pass
  *    must have.
  *
  *  - t53: per-language precision/recall/F1 of the t19 trigram
  *    language classifier, derived from its confusion matrix — the
  *    evaluation half of language ID that t19's raw matrix doesn't
  *    surface. Matrix is k² ≤ 25 rows, so every join here is
  *    trivially broadcast; the heavy lifting is t19's own pipeline.
  */
object TextOps58 {
  import Tables.t

  private val CommonWords =
    Seq("the", "a", "data", "value", "table", "row", "key", "query")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t52_gopher_rules" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .withColumn("w", split(col("text"), " "))
        .withColumn("n", size(col("w")))
        // single-space invariant: Σ word length = len − (n−1)
        .withColumn("sumlen", length(col("text")) - col("n") + 1)
        .withColumn("n_alpha",
          size(expr("filter(w, x -> x rlike '[a-z]')")))
        // `div`, not `/`: Column `/` is double division, and the rule
        // must stay in integers end to end
        .withColumn("n_sym", expr(
          """(length(text) - length(replace(text, '#', '')))
            | + (length(text) - length(replace(text, '...', ''))) div 3"""
            .stripMargin))
        .withColumn("n_common",
          CommonWords.map(sw =>
            when(array_contains(col("w"), sw), 1).otherwise(0))
            .reduce(_ + _))
      d.select(col("doc_id"), col("n").as("n_words"),
          (col("n") >= 50 && col("n") <= 100000).as("r_word_count"),
          (col("sumlen") >= col("n") * 3 &&
            col("sumlen") <= col("n") * 10).as("r_mean_word_len"),
          (col("n_alpha") * 5 >= col("n") * 4).as("r_alpha_ratio"),
          (col("n_common") >= 2).as("r_common_words"),
          (col("n_sym") * 10 < col("n")).as("r_symbol_ratio"))
        .withColumn("keep",
          col("r_word_count") && col("r_mean_word_len") &&
            col("r_alpha_ratio") && col("r_common_words") &&
            col("r_symbol_ratio"))
        .orderBy("doc_id")
    }),

    "t53_langid_prf" -> ((spark, dir) => {
      val cm = TextOps4.queries("t19_trigram_langid")(spark, dir)
      val actual = cm.groupBy("true_lang")
        .agg(sum(col("n")).as("n_actual"))
      val pred = cm.groupBy("pred_lang").agg(sum(col("n")).as("n_pred"))
      val tp = cm.filter(col("true_lang") === col("pred_lang"))
        .select(col("true_lang").as("cls"), col("n").as("tp"))
      actual.join(pred, col("true_lang") === col("pred_lang"), "full_outer")
        .select(coalesce(col("true_lang"), col("pred_lang")).as("cls"),
          coalesce(col("n_actual"), lit(0L)).as("n_actual"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"))
        .join(tp, Seq("cls"), "left")
        .withColumn("tp", coalesce(col("tp"), lit(0L)))
        .select(col("cls"), col("tp"), col("n_pred"), col("n_actual"),
          round(expr("tp / cast(nullif(n_pred, 0) as double)"), 6)
            .as("precision"),
          round(expr("tp / cast(nullif(n_actual, 0) as double)"), 6)
            .as("recall"),
          round(expr(
            "2.0d * tp / cast(nullif(n_pred + n_actual, 0) as double)"), 6)
            .as("f1"))
        .orderBy("cls")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t52_gopher_rules" -> s"""
      WITH d AS (
        SELECT doc_id, text, string_split(text, ' ') AS w,
          len(string_split(text, ' ')) AS n,
          length(text) - len(string_split(text, ' ')) + 1 AS sumlen,
          len(list_filter(string_split(text, ' '),
            x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
          (length(text) - length(replace(text, '#', '')))
            + (length(text) - length(replace(text, '...', ''))) // 3
            AS n_sym,
          ${CommonWords.map(sw =>
            s"(CASE WHEN list_contains(string_split(text, ' '), '$sw') " +
              "THEN 1 ELSE 0 END)").mkString(" + ")} AS n_common
        FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, n AS n_words,
        n >= 50 AND n <= 100000 AS r_word_count,
        sumlen >= n * 3 AND sumlen <= n * 10 AS r_mean_word_len,
        n_alpha * 5 >= n * 4 AS r_alpha_ratio,
        n_common >= 2 AS r_common_words,
        n_sym * 10 < n AS r_symbol_ratio,
        (n >= 50 AND n <= 100000) AND (sumlen >= n * 3 AND sumlen <= n * 10)
          AND (n_alpha * 5 >= n * 4) AND (n_common >= 2)
          AND (n_sym * 10 < n) AS keep
      FROM d ORDER BY doc_id""",

    "t53_langid_prf" -> s"""
      WITH cm AS (${TextOps4.oracleSql("t19_trigram_langid")}),
      act AS (SELECT true_lang AS cls, CAST(sum(n) AS BIGINT) AS n_actual
              FROM cm GROUP BY 1),
      prd AS (SELECT pred_lang AS cls, CAST(sum(n) AS BIGINT) AS n_pred
              FROM cm GROUP BY 1),
      tp AS (SELECT true_lang AS cls, CAST(n AS BIGINT) AS tp FROM cm
             WHERE true_lang = pred_lang),
      cls AS (
        SELECT coalesce(act.cls, prd.cls) AS cls,
          coalesce(n_actual, 0) AS n_actual, coalesce(n_pred, 0) AS n_pred
        FROM act FULL OUTER JOIN prd ON act.cls = prd.cls)
      SELECT cls.cls, coalesce(tp.tp, 0) AS tp, n_pred, n_actual,
        round(coalesce(tp.tp, 0) / CAST(nullif(n_pred, 0) AS DOUBLE), 6)
          AS precision,
        round(coalesce(tp.tp, 0) / CAST(nullif(n_actual, 0) AS DOUBLE), 6)
          AS recall,
        round(2.0 * coalesce(tp.tp, 0)
          / CAST(nullif(n_pred + n_actual, 0) AS DOUBLE), 6) AS f1
      FROM cls LEFT JOIN tp ON cls.cls = tp.cls
      ORDER BY cls.cls""",
  )
}
