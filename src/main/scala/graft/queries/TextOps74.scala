package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.BpeLearn

/** Round-7 additions, batch 74 (SURVEY.md §2.4) — tokenizer learning:
  *
  *  - t58: BPE pair statistics, round 0 — the corpus-wide
  *    frequency-weighted adjacent-character-pair table the first merge
  *    of byte-pair-encoding vocabulary learning is chosen from. The
  *    corpus folds to a distinct-word frequency table first (the only
  *    corpus-sized aggregation; 10^9 documents shrink to a few 10^6
  *    vocab rows before any per-character work), then explodes each
  *    word once into its adjacent pairs, weighted by word frequency —
  *    two map-side-combinable aggregations, no iteration. Words are
  *    `[a-z]+` runs of the RAW text (no lowercasing: Java and utf8proc
  *    disagree on exotic case foldings, and the pair table's semantics
  *    don't need it).
  *  - t60: BPE round 1 — [[graft.operators.BpeLearn]] learns the top
  *    merge (one collected argmax scalar — the per-round driver
  *    traffic), applies it to every word with the row-local greedy
  *    `aggregate` fold, and re-counts pairs over the merged tokens.
  *    The oracle replays the merge with the placeholder-replace device
  *    (replace() is left-to-right non-overlapping in both engines —
  *    exactly BPE's application order), so the hash match proves the
  *    distributed fold implements the textbook merge step.
  */
object TextOps74 {
  import Tables.t

  private def wordCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(expr(
        "regexp_extract_all(text, '[a-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t58_bpe_pair_stats" -> ((spark, dir) => {
      val words = wordCounts(spark, dir)
        .filter(length(col("w")) >= 2)
      words
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, length(w) - 1)," +
            " i -> substring(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("pair").asc)
        .limit(20)
    }),

    "t60_bpe_round1" -> ((spark, dir) => {
      val (merges, st1) = BpeLearn.learn(wordCounts(spark, dir), 1)
      val m = merges.head
      BpeLearn.pairCounts(st1)
        .select(concat_ws("+", col("l"), col("r")).as("pair"),
          col("total"))
        .withColumn("merged_l", lit(m.left))
        .withColumn("merged_r", lit(m.right))
        .orderBy(col("total").desc, col("pair").asc)
        .limit(15)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t58_bpe_pair_stats" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT w, count(*) AS cnt FROM w
        |  WHERE length(w) >= 2 GROUP BY 1),
        |p AS (
        |  SELECT w, cnt, unnest(range(1, length(w))) AS i FROM wc)
        |SELECT substring(w, CAST(i AS INTEGER), 2) AS pair,
        |  CAST(sum(cnt) AS BIGINT) AS total
        |FROM p GROUP BY 1
        |ORDER BY total DESC, pair LIMIT 20""".stripMargin,

    // the merge is applied with replace(w, l||r, chr(1)): left-to-right
    // non-overlapping, exactly the greedy fold's order; chr(1) can't
    // appear in an [a-z]+ word
    "t60_bpe_round1" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w
        |  FROM documents),
        |wc AS (SELECT w, count(*) AS cnt FROM w GROUP BY 1),
        |p0 AS (
        |  SELECT w, cnt, unnest(range(1, length(w))) AS i FROM wc
        |  WHERE length(w) >= 2),
        |pc0 AS (
        |  SELECT substring(w, CAST(i AS INTEGER), 1) AS l,
        |    substring(w, CAST(i + 1 AS INTEGER), 1) AS r,
        |    sum(cnt) AS total
        |  FROM p0 GROUP BY 1, 2),
        |top1 AS (SELECT l, r FROM pc0
        |  ORDER BY total DESC, l, r LIMIT 1),
        |mk AS (
        |  SELECT replace(w, (SELECT l || r FROM top1), chr(1)) AS m,
        |    cnt
        |  FROM wc),
        |t1 AS (
        |  SELECT m, cnt, unnest(range(1, length(m))) AS i FROM mk
        |  WHERE length(m) >= 2),
        |pc1 AS (
        |  SELECT
        |    CASE WHEN substring(m, CAST(i AS INTEGER), 1) = chr(1)
        |      THEN (SELECT l || r FROM top1)
        |      ELSE substring(m, CAST(i AS INTEGER), 1) END AS l,
        |    CASE WHEN substring(m, CAST(i + 1 AS INTEGER), 1) = chr(1)
        |      THEN (SELECT l || r FROM top1)
        |      ELSE substring(m, CAST(i + 1 AS INTEGER), 1) END AS r,
        |    sum(cnt) AS total
        |  FROM t1 GROUP BY 1, 2)
        |SELECT l || '+' || r AS pair, CAST(total AS BIGINT) AS total,
        |  (SELECT l FROM top1) AS merged_l,
        |  (SELECT r FROM top1) AS merged_r
        |FROM pc1 ORDER BY total DESC, pair LIMIT 15""".stripMargin,
  )
}
