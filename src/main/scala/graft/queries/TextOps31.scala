package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 62 text ops (SURVEY.md §2.4):
  *
  *  - t34: character-class entropy — Shannon entropy over the
  *    {lower, upper, digit, space, other} class distribution of each
  *    document. Degenerate (low-entropy) text — repeated padding,
  *    number dumps, shouting — scores near 0 and gets flagged. Class
  *    counts are exact (regex strip + length diff); the 5-term
  *    entropy is float per row from those exact counts, so the result
  *    is partitioning-independent. Pure per-row expressions: map-only,
  *    no shuffle except the presentation sort.
  *  - t35: Flesch-style readability — words, sentence marks, and
  *    vowel-group syllable approximations counted per row
  *    (`regexp_count`), then the 206.835 − 1.015·W/S − 84.6·Syl/W
  *    score with a banded difficulty label. Same map-only shape; the
  *    quality-filter companion to t2/t13 for curriculum bucketing.
  */
object TextOps31 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t34_char_entropy" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("tot", length(col("text")).cast("long"))
        .withColumn("n_lower",
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
        .withColumn("n_upper",
          length(regexp_replace(col("text"), "[^A-Z]", "")).cast("long"))
        .withColumn("n_digit",
          length(regexp_replace(col("text"), "[^0-9]", "")).cast("long"))
        .withColumn("n_space",
          (col("tot") - length(regexp_replace(col("text"), " ", "")))
            .cast("long"))
        .withColumn("n_other",
          col("tot") - col("n_lower") - col("n_upper") - col("n_digit")
            - col("n_space"))
      val term = (c: String) =>
        when(col(c) > 0,
          -(col(c).cast("double") / col("tot").cast("double"))
            * log(col(c).cast("double") / col("tot").cast("double")))
          .otherwise(lit(0.0))
      d.withColumn("entropy",
          when(col("tot") > 0,
            round(term("n_lower") + term("n_upper") + term("n_digit")
              + term("n_space") + term("n_other"), 6))
            .otherwise(lit(null).cast("double")))
        .select(col("doc_id"), col("tot").as("n_chars_exact"),
          col("n_lower"), col("n_upper"), col("n_digit"), col("n_space"),
          col("n_other"), col("entropy"),
          (coalesce(col("entropy"), lit(0.0)) < 0.5).as("degenerate"))
        .orderBy("doc_id")
    }),

    "t35_readability" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("n_words",
          regexp_count(col("text"), lit("[A-Za-z]+")).cast("long"))
        .withColumn("n_sentences",
          greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"),
            lit(1L)))
        .withColumn("n_syllables",
          regexp_count(col("text"), lit("[aeiouyAEIOUY]+")).cast("long"))
      d.withColumn("flesch",
          when(col("n_words") > 0,
            round(lit(206.835)
              - lit(1.015) * col("n_words").cast("double")
                / col("n_sentences").cast("double")
              - lit(84.6) * col("n_syllables").cast("double")
                / col("n_words").cast("double"), 4))
            .otherwise(lit(null).cast("double")))
        .withColumn("band",
          when(col("flesch").isNull, "no_text")
            .when(col("flesch") >= 90, "very_easy")
            .when(col("flesch") >= 60, "plain")
            .when(col("flesch") >= 30, "difficult")
            .otherwise("very_difficult"))
        .select("doc_id", "n_words", "n_sentences", "n_syllables",
          "flesch", "band")
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t34_char_entropy" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS tot,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_lower,
        |    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS BIGINT) AS n_upper,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
        |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space
        |  FROM documents),
        |c2 AS (
        |  SELECT *, tot - n_lower - n_upper - n_digit - n_space AS n_other
        |  FROM c),
        |e AS (
        |  SELECT *,
        |    CASE WHEN tot > 0 THEN round(
        |      (CASE WHEN n_lower > 0 THEN -(CAST(n_lower AS DOUBLE)/tot) * ln(CAST(n_lower AS DOUBLE)/tot) ELSE 0 END)
        |      + (CASE WHEN n_upper > 0 THEN -(CAST(n_upper AS DOUBLE)/tot) * ln(CAST(n_upper AS DOUBLE)/tot) ELSE 0 END)
        |      + (CASE WHEN n_digit > 0 THEN -(CAST(n_digit AS DOUBLE)/tot) * ln(CAST(n_digit AS DOUBLE)/tot) ELSE 0 END)
        |      + (CASE WHEN n_space > 0 THEN -(CAST(n_space AS DOUBLE)/tot) * ln(CAST(n_space AS DOUBLE)/tot) ELSE 0 END)
        |      + (CASE WHEN n_other > 0 THEN -(CAST(n_other AS DOUBLE)/tot) * ln(CAST(n_other AS DOUBLE)/tot) ELSE 0 END), 6)
        |    ELSE NULL END AS entropy
        |  FROM c2)
        |SELECT doc_id, tot AS n_chars_exact, n_lower, n_upper, n_digit,
        |  n_space, n_other, entropy,
        |  coalesce(entropy, 0.0) < 0.5 AS degenerate
        |FROM e ORDER BY doc_id""".stripMargin,

    "t35_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1) AS n_sentences,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables
        |  FROM documents),
        |f AS (
        |  SELECT *,
        |    CASE WHEN n_words > 0 THEN round(206.835
        |      - 1.015 * CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)
        |      - 84.6 * CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 4)
        |    ELSE NULL END AS flesch
        |  FROM c)
        |SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
        |  CASE WHEN flesch IS NULL THEN 'no_text'
        |    WHEN flesch >= 90 THEN 'very_easy'
        |    WHEN flesch >= 60 THEN 'plain'
        |    WHEN flesch >= 30 THEN 'difficult'
        |    ELSE 'very_difficult' END AS band
        |FROM f ORDER BY doc_id""".stripMargin,
  )
}
