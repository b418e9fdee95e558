package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 additions, batch 78 (SURVEY.md §2.4) — exact-substring
  * dedup:
  *
  *  - d61: EXACT-SUBSTRING duplicate spans — the character-level dedup
  *    family (the "ExactSubstr" approach of training-data dedup
  *    literature, approximated with fixed-width anchors instead of a
  *    suffix array): a position is duplicated iff the K=20-char window
  *    starting there occurs anywhere else in the corpus (including the
  *    same document — self-repeats are duplicates too); maximal
  *    duplicated CHARACTER intervals come from a gaps-and-islands
  *    union over the per-position [p, p+19] intervals, so overlapping
  *    anchor windows collapse into one span and `dup_chars` counts
  *    each character once. Output: the 15 most-duplicated documents
  *    (span count, duplicated chars, longest span) plus corpus totals
  *    including the chars a span-excision pass would retain.
  *
  *    Scale shape: the position explode is map-side; the only
  *    all-data shuffle is the window keyed on the gram's 62-bit
  *    `Md5Pack` — the 20-char gram hashes to 8 bytes MAP-SIDE, so the
  *    exchange ships ~2.5× fewer key bytes than the raw string would
  *    (the collision rate at 2^62 is negligible and symmetric: the
  *    DuckDB oracle replays the identical hash via `duckMd5Pack`, so
  *    any collision collapses the same windows on both sides). Island
  *    merging runs in per-document windows — partitioned, never
  *    global.
  */
object TextOps78 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d61_exact_substring_spans" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents").select("doc_id", "text")
      // anchor positions: one row per K-window start
      val grams = docs.filter(length(col("text")) >= 20)
        .select(col("doc_id"),
          explode(expr("sequence(1, length(text) - 19)")).as("p"),
          col("text"))
        .select(col("doc_id"), col("p"),
          graft.functions.Md5Pack(expr("substring(text, p, 20)"))
            .as("g"))
      // duplicated position = its gram occurs more than once anywhere;
      // one gram-keyed window instead of a groupBy + self-join
      val dup = grams
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .filter(col("n") > 1).select("doc_id", "p")
      // interval union per document: a new span starts where p clears
      // the running max end of every earlier interval by 2+ chars
      val w = Window.partitionBy("doc_id").orderBy("p")
      val spans = dup
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
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_chars"),
        max(col("e") - col("s") + 1).cast("long").as("max_span"))
      val corpus = perDoc.agg(
          count(lit(1)).as("docs_with_dups"),
          sum(col("n_spans")).as("total_spans"),
          sum(col("dup_chars")).as("total_dup_chars"))
        .crossJoin(broadcast(docs.agg(
          count(lit(1)).as("total_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))))
        .select(col("docs_with_dups"), col("total_spans"),
          col("total_dup_chars"), col("total_docs"), col("total_chars"),
          (col("total_chars") - col("total_dup_chars"))
            .as("retained_chars"))
      perDoc.orderBy(col("dup_chars").desc, col("doc_id").asc).limit(15)
        .crossJoin(broadcast(corpus))
        // the anchor-grain bound, stated IN the result: a repeat
        // shorter than the K=20 anchor window is invisible to this
        // profile (a true suffix-grain pass has no such floor) —
        // consumers read the floor next to the counts it bounds
        .withColumn("min_detectable_span", lit(20L))
        .orderBy(col("dup_chars").desc, col("doc_id").asc)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the same anchor/window/island pipeline in DuckDB; integer sums
    // cast back to BIGINT (DuckDB integer SUM widens to HUGEINT)
    "d61_exact_substring_spans" ->
      s"""WITH pos AS (
        |  SELECT doc_id,
        |    CAST(unnest(range(1, length(text) - 18)) AS INTEGER) AS p,
        |    text
        |  FROM documents WHERE length(text) >= 20),
        |g AS (
        |  SELECT doc_id, p,
        |    ${Tables.duckMd5Pack("substring(text, p, 20)")} AS g
        |  FROM pos),
        |d AS (
        |  SELECT doc_id, p FROM (
        |    SELECT doc_id, p, count(*) OVER (PARTITION BY g) AS n
        |    FROM g) WHERE n > 1),
        |f AS (
        |  SELECT doc_id, p,
        |    max(p + 19) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_hi
        |  FROM d),
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
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(e - s + 1) AS BIGINT) AS dup_chars,
        |    CAST(max(e - s + 1) AS BIGINT) AS max_span
        |  FROM sp GROUP BY 1),
        |tc AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total_docs,
        |    CAST(sum(length(text)) AS BIGINT) AS total_chars
        |  FROM documents),
        |corpus AS (
        |  SELECT CAST(count(*) AS BIGINT) AS docs_with_dups,
        |    CAST(sum(n_spans) AS BIGINT) AS total_spans,
        |    CAST(sum(dup_chars) AS BIGINT) AS total_dup_chars
        |  FROM pd),
        |top AS (
        |  SELECT doc_id, n_spans, dup_chars, max_span FROM pd
        |  ORDER BY dup_chars DESC, doc_id LIMIT 15)
        |SELECT t.doc_id, t.n_spans, t.dup_chars, t.max_span,
        |  c.docs_with_dups, c.total_spans, c.total_dup_chars,
        |  tc.total_docs, tc.total_chars,
        |  tc.total_chars - c.total_dup_chars AS retained_chars,
        |  CAST(20 AS BIGINT) AS min_detectable_span
        |FROM top t, corpus c, tc
        |ORDER BY t.dup_chars DESC, t.doc_id""".stripMargin,
  )
}
