package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 additions, batch 82 (SURVEY.md §2.4) — exact-substring
  * dedup, part 2:
  *
  *  - d63: DUPLICATE-SPAN EXCISION — the policy half of ExactSubstr
  *    dedup (d61 measures the duplication; this executes the cut).
  *    Every duplicated 20-char window keeps its globally FIRST
  *    occurrence (min (doc_id, position) per gram — the
  *    keep-one-copy discipline) and every other occurrence is
  *    excised: per document, the non-canonical duplicated windows
  *    union into maximal character intervals (d61's gaps-and-islands
  *    device) and the cleaned length is chars − excised. Output: the
  *    15 most-cut documents plus corpus totals — chars before/after
  *    and the canonical windows retained.
  *
  *    Scale shape: the keeper choice is ONE row_number window keyed on
  *    the gram's 62-bit `Md5Pack` (same exchange d61's duplication
  *    count rides; the 20-char gram hashes to 8 bytes map-side, and
  *    the oracle replays the identical hash via `duckMd5Pack`, so a
  *    collision collapses the same windows on both sides); interval
  *    union stays in per-document windows.
  */
object TextOps82 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d63_span_excision" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents").select("doc_id", "text")
      val grams = docs.filter(length(col("text")) >= 20)
        .select(col("doc_id"),
          explode(expr("sequence(1, length(text) - 19)")).as("p"),
          col("text"))
        .select(col("doc_id"), col("p"),
          graft.functions.Md5Pack(expr("substring(text, p, 20)"))
            .as("g"))
      // one gram-keyed window serves both decisions: is this window
      // duplicated, and is this occurrence the canonical (first) one
      val wg = Window.partitionBy("g")
      val cut = grams
        .withColumn("n", count(lit(1)).over(wg))
        .withColumn("rn", row_number().over(
          wg.orderBy(col("doc_id").asc, col("p").asc)))
        .filter(col("n") > 1 && col("rn") > 1)
        .select("doc_id", "p")
      val w = Window.partitionBy("doc_id").orderBy("p")
      val spans = cut
        .withColumn("prev_hi", max(col("p") + lit(19))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("fresh",
          when(col("prev_hi").isNull || col("p") > col("prev_hi") + 1,
            1L).otherwise(0L))
        .withColumn("span", sum(col("fresh"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "span")
        .agg(min(col("p")).as("s"), (max(col("p")) + lit(19)).as("e"))
      val perDoc = spans.groupBy("doc_id").agg(
        count(lit(1)).as("n_cuts"),
        sum(col("e") - col("s") + 1).as("excised_chars"))
      val kept = grams
        .withColumn("n", count(lit(1)).over(wg))
        .withColumn("rn", row_number().over(
          wg.orderBy(col("doc_id").asc, col("p").asc)))
        .filter(col("n") > 1 && col("rn") === 1)
        .agg(count(lit(1)).as("canonical_windows"))
      val corpus = perDoc.agg(
          count(lit(1)).as("docs_cut"),
          sum(col("excised_chars")).as("total_excised"))
        .crossJoin(broadcast(docs.agg(
          sum(length(col("text")).cast("long")).as("chars_before"))))
        .crossJoin(broadcast(kept))
        .select(col("docs_cut"), col("total_excised"),
          col("chars_before"),
          (col("chars_before") - col("total_excised"))
            .as("chars_after"),
          col("canonical_windows"))
      perDoc
        .join(docs.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars")), "doc_id")
        .select(col("doc_id"), col("n_cuts"), col("excised_chars"),
          (col("n_chars") - col("excised_chars")).as("cleaned_chars"))
        .orderBy(col("excised_chars").desc, col("doc_id").asc).limit(15)
        .crossJoin(broadcast(corpus))
        // the anchor-grain bound, stated IN the result: a repeat
        // shorter than the K=20 anchor window is never cut (a true
        // suffix-grain pass has no such floor)
        .withColumn("min_detectable_span", lit(20L))
        .orderBy(col("excised_chars").desc, col("doc_id").asc)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d63_span_excision" ->
      s"""WITH pos AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(1, length(text) - 18)) AS INTEGER) AS p,
        |    text
        |  FROM documents WHERE length(text) >= 20),
        |g AS (
        |  SELECT doc_id, p,
        |    ${Tables.duckMd5Pack("substring(text, p, 20)")} AS g
        |  FROM pos),
        |r AS (
        |  SELECT doc_id, p,
        |    count(*) OVER (PARTITION BY g) AS n,
        |    row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
        |  FROM g),
        |cut AS (SELECT doc_id, p FROM r WHERE n > 1 AND rn > 1),
        |kept AS (
        |  SELECT CAST(count(*) AS BIGINT) AS canonical_windows
        |  FROM r WHERE n > 1 AND rn = 1),
        |f AS (
        |  SELECT doc_id, p,
        |    max(p + 19) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_hi
        |  FROM cut),
        |s AS (
        |  SELECT doc_id, p,
        |    sum(CASE WHEN prev_hi IS NULL OR p > prev_hi + 1
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS span
        |  FROM f),
        |sp AS (
        |  SELECT doc_id, span, min(p) AS s, max(p) + 19 AS e
        |  FROM s GROUP BY 1, 2),
        |pd AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cuts,
        |    CAST(sum(e - s + 1) AS BIGINT) AS excised_chars
        |  FROM sp GROUP BY 1),
        |tc AS (
        |  SELECT CAST(sum(length(text)) AS BIGINT) AS chars_before
        |  FROM documents),
        |corpus AS (
        |  SELECT CAST(count(*) AS BIGINT) AS docs_cut,
        |    CAST(sum(excised_chars) AS BIGINT) AS total_excised
        |  FROM pd),
        |top AS (
        |  SELECT pd.doc_id, pd.n_cuts, pd.excised_chars,
        |    CAST(length(d.text) - pd.excised_chars AS BIGINT)
        |      AS cleaned_chars
        |  FROM pd JOIN documents d ON d.doc_id = pd.doc_id
        |  ORDER BY pd.excised_chars DESC, pd.doc_id LIMIT 15)
        |SELECT t.doc_id, t.n_cuts, t.excised_chars, t.cleaned_chars,
        |  c.docs_cut, c.total_excised, tc.chars_before,
        |  tc.chars_before - c.total_excised AS chars_after,
        |  k.canonical_windows,
        |  CAST(20 AS BIGINT) AS min_detectable_span
        |FROM top t, corpus c, tc, kept k
        |ORDER BY t.excised_chars DESC, t.doc_id""".stripMargin,
  )
}
