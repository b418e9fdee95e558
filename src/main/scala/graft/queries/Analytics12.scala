package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 12 (SURVEY.md §2.4):
  *
  *  - q119: zone-map skipping audit — the data-skipping effectiveness
  *    report a lakehouse table maintainer reads next to q116's
  *    compaction plan: per-file min/max stats (ONE aggregation pass
  *    over the fact table) evaluated against a literal predicate set;
  *    a file is skippable when its [min,max] envelope misses the
  *    predicate range. Predicate × file-stats is metadata-sized on
  *    both axes — the fact scan happens once, never per predicate.
  *  - q120: PSI distribution drift — the population-stability-index
  *    companion to q72's KS test: reference (pre-1996) vs current
  *    shipments binned into 20 fixed-width price buckets over a dense
  *    literal spine (zero-count bins carry Laplace smoothing, so no
  *    log-of-zero), per-bin terms rounded→DECIMAL before the exact
  *    cross-bin sum (the float re-aggregation rule). Bin counts are
  *    one map-side-combinable pass per side.
  *  - t26: code-vs-prose detector — corpus curation for LLM training
  *    mixes: per-document symbol densities (semicolons, braces,
  *    parens, '=') and keyword hits counted by pure length-delta
  *    string ops (no regex-engine parity surface), combined into a
  *    score and an is_code verdict. Planted code-block variants
  *    guarantee true positives; everything is one narrow projection.
  */
object Analytics12 {
  import Tables.t

  private val ZonePreds: Seq[(Int, Long, Long)] = Seq(
    (1, 50000L, 100000L), (2, 0L, 25000L), (3, 150000L, 999999999L),
    (4, 300000L, 400000L), (5, 0L, 999999999L))
  private val PsiBins = 20
  private val PsiWidth = 5000

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_zonemap_skipping" -> ((spark, dir) => {
      import spark.implicits._
      val stats = t(spark, dir, "orders")
        .groupBy(col("o_orderpriority").as("part"),
          (col("o_orderkey") % 40).as("file_id"))
        .agg(min(col("o_totalprice")).as("f_min"),
          max(col("o_totalprice")).as("f_max"),
          count(lit(1)).as("f_rows"))
      val preds = ZonePreds.toDF("pred_id", "lo", "hi")
      stats.crossJoin(broadcast(preds))
        .withColumn("skip",
          col("f_max") < col("lo") || col("f_min") > col("hi"))
        .groupBy("pred_id", "lo", "hi")
        .agg(count(lit(1)).as("n_files"),
          count_if(col("skip")).as("n_skipped"),
          sum(when(col("skip"), 0L).otherwise(col("f_rows")))
            .as("rows_scanned"))
        .withColumn("skip_frac",
          round(col("n_skipped").cast("double") / col("n_files"), 6))
        .select("pred_id", "lo", "hi", "n_files", "n_skipped",
          "rows_scanned", "skip_frac")
        .orderBy("pred_id")
    }),

    "q120_psi_drift" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .select(
          least(lit(PsiBins - 1L),
            expr(s"CAST(floor(l_extendedprice / $PsiWidth) AS BIGINT)"))
            .as("bin"),
          (col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
            .as("is_ref"))
      val counts = li.groupBy("bin")
        .agg(count_if(col("is_ref")).as("cnt_ref"),
          count_if(!col("is_ref")).as("cnt_cur"))
      val spine = spark.range(PsiBins).select(col("id").as("bin"))
      val binned = spine.join(counts, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
          coalesce(col("cnt_cur"), lit(0L)).as("cnt_cur"))
      val totals = binned.agg(sum(col("cnt_ref")).as("n_ref"),
        sum(col("cnt_cur")).as("n_cur"))
      // Laplace-smoothed shares (no log-of-zero on empty bins); the
      // per-bin term rounds →DECIMAL before the exact cross-bin sum
      val terms = binned.crossJoin(broadcast(totals))
        .withColumn("pa", (col("cnt_ref") + 1).cast("double") /
          (col("n_ref") + PsiBins))
        .withColumn("pb", (col("cnt_cur") + 1).cast("double") /
          (col("n_cur") + PsiBins))
        .withColumn("psi_term",
          round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9))
      terms.select(col("bin"), col("cnt_ref"), col("cnt_cur"),
          col("psi_term"))
        .unionByName(terms.agg(sum(col("cnt_ref")).as("cnt_ref"),
          sum(col("cnt_cur")).as("cnt_cur"),
          sum(col("psi_term").cast("decimal(18,9)")).cast("double")
            .as("psi_term"))
          .select(lit(-1L).as("bin"), col("cnt_ref"), col("cnt_cur"),
            col("psi_term")))
        .orderBy("bin")
    }),

    "t26_code_score" -> ((spark, dir) => {
      val base = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      // planted code-block variants: deterministic true positives
      val planted = base.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"),
            lit("\ndef f(x) { return x + 1; }\nimport os;\n" +
              "def g(y) { return y * 2; }")).as("text"))
      def occurrences(s: org.apache.spark.sql.Column, needle: String) =
        ((length(s) - length(replace(s, lit(needle), lit("")))) /
          needle.length).cast("long")
      base.unionByName(planted)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("n_symbols",
          occurrences(col("text"), ";") + occurrences(col("text"), "{") +
            occurrences(col("text"), "}") + occurrences(col("text"), "=") +
            occurrences(col("text"), "(") + occurrences(col("text"), ")"))
        .withColumn("n_keywords",
          occurrences(col("text"), "def ") +
            occurrences(col("text"), "return ") +
            occurrences(col("text"), "import "))
        .withColumn("symbol_frac", round(col("n_symbols").cast("double") /
          col("n_chars"), 6))
        .withColumn("score", round(col("symbol_frac") * 10 +
          col("n_keywords").cast("double") / greatest(col("n_chars"), lit(1L))
            * 1000, 6))
        .withColumn("is_code",
          col("score") >= 0.5 && col("n_keywords") >= 2)
        .select("doc_id", "n_chars", "n_symbols", "n_keywords",
          "symbol_frac", "score", "is_code")
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q119_zonemap_skipping" -> {
      val predValues = ZonePreds
        .map { case (id, lo, hi) => s"($id, $lo, $hi)" }.mkString(", ")
      s"""WITH stats AS (
         |  SELECT o_orderpriority AS part, o_orderkey % 40 AS file_id,
         |    min(o_totalprice) AS f_min, max(o_totalprice) AS f_max,
         |    CAST(count(*) AS BIGINT) AS f_rows
         |  FROM orders GROUP BY 1, 2),
         |preds(pred_id, lo, hi) AS (VALUES $predValues)
         |SELECT CAST(pred_id AS INTEGER) AS pred_id,
         |  CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(count(*) FILTER (WHERE f_max < lo OR f_min > hi) AS BIGINT)
         |    AS n_skipped,
         |  CAST(sum(CASE WHEN f_max < lo OR f_min > hi THEN 0
         |    ELSE f_rows END) AS BIGINT) AS rows_scanned,
         |  round(CAST(count(*) FILTER (WHERE f_max < lo OR f_min > hi)
         |    AS DOUBLE) / count(*), 6) AS skip_frac
         |FROM stats CROSS JOIN preds
         |GROUP BY 1, 2, 3 ORDER BY pred_id""".stripMargin
    },

    "q120_psi_drift" ->
      s"""WITH li AS (
         |  SELECT least(${PsiBins - 1},
         |      CAST(floor(l_extendedprice / $PsiWidth) AS BIGINT)) AS bin,
         |    l_shipdate < TIMESTAMP '1996-01-01' AS is_ref
         |  FROM lineitem),
         |counts AS (
         |  SELECT bin,
         |    CAST(count(*) FILTER (WHERE is_ref) AS BIGINT) AS cnt_ref,
         |    CAST(count(*) FILTER (WHERE NOT is_ref) AS BIGINT) AS cnt_cur
         |  FROM li GROUP BY 1),
         |binned AS (
         |  SELECT r.range AS bin, coalesce(cnt_ref, 0) AS cnt_ref,
         |    coalesce(cnt_cur, 0) AS cnt_cur
         |  FROM range($PsiBins) r LEFT JOIN counts ON r.range = counts.bin),
         |tot AS (
         |  SELECT CAST(sum(cnt_ref) AS BIGINT) AS n_ref,
         |    CAST(sum(cnt_cur) AS BIGINT) AS n_cur
         |  FROM binned),
         |terms AS (
         |  SELECT bin, cnt_ref, cnt_cur,
         |    round((CAST(cnt_ref + 1 AS DOUBLE) / (n_ref + $PsiBins)
         |      - CAST(cnt_cur + 1 AS DOUBLE) / (n_cur + $PsiBins))
         |      * ln((CAST(cnt_ref + 1 AS DOUBLE) / (n_ref + $PsiBins))
         |        / (CAST(cnt_cur + 1 AS DOUBLE) / (n_cur + $PsiBins))), 9)
         |      AS psi_term
         |  FROM binned CROSS JOIN tot)
         |SELECT bin, cnt_ref, cnt_cur, psi_term FROM terms
         |UNION ALL
         |SELECT -1, CAST(sum(cnt_ref) AS BIGINT),
         |  CAST(sum(cnt_cur) AS BIGINT),
         |  CAST(sum(CAST(psi_term AS DECIMAL(18,9))) AS DOUBLE)
         |FROM terms
         |ORDER BY bin""".stripMargin,

    "t26_code_score" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 200000, text || chr(10) ||
        |    'def f(x) { return x + 1; }' || chr(10) || 'import os;' ||
        |    chr(10) || 'def g(y) { return y * 2; }'
        |  FROM documents WHERE text IS NOT NULL AND doc_id % 40 = 0),
        |m AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(replace(text, ';', ''))
        |      + length(text) - length(replace(text, '{', ''))
        |      + length(text) - length(replace(text, '}', ''))
        |      + length(text) - length(replace(text, '=', ''))
        |      + length(text) - length(replace(text, '(', ''))
        |      + length(text) - length(replace(text, ')', '')) AS BIGINT)
        |      AS n_symbols,
        |    CAST((length(text) - length(replace(text, 'def ', ''))) // 4
        |      + (length(text) - length(replace(text, 'return ', ''))) // 7
        |      + (length(text) - length(replace(text, 'import ', ''))) // 7
        |      AS BIGINT) AS n_keywords
        |  FROM docs),
        |scored AS (
        |  SELECT *, round(CAST(n_symbols AS DOUBLE) / n_chars, 6)
        |    AS symbol_frac
        |  FROM m),
        |s2 AS (
        |  SELECT *, round(symbol_frac * 10
        |    + CAST(n_keywords AS DOUBLE) / greatest(n_chars, 1) * 1000, 6)
        |    AS score
        |  FROM scored)
        |SELECT doc_id, n_chars, n_symbols, n_keywords, symbol_frac, score,
        |  score >= 0.5 AND n_keywords >= 2 AS is_code
        |FROM s2 ORDER BY doc_id""".stripMargin,
  )
}
