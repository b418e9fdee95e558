package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 44 text ops (SURVEY.md §2.4):
  *
  *  - d33: substring-dedup masking — the RefinedWeb-style pass that
  *    d13's span census only *profiles*: for every document, how many
  *    tokens sit inside an 8-token span that also appears in another
  *    document, i.e. how much of the doc substring-level dedup would
  *    mask? Positions matter here (d13 deduplicates spans per doc;
  *    masking must count every occurrence), so the pipeline is:
  *    positional 8-gram explode → cross-doc duplicate span set (one
  *    shuffle on the span) → per-doc interval merge of the hit spans
  *    [pos, pos+8) via the q54 islands discipline (running-max window
  *    PER DOC — bounded by a doc's token count, never global) →
  *    exact covered-token sums. All integer arithmetic; the mask
  *    fraction's division is the only float step.
  *  - d34: train/val/test split-leakage audit — the check a training
  *    pipeline runs BEFORE shipping shards: assign every document a
  *    deterministic content-hash split (md5-pack mod 10 → 8/1/1), then
  *    cross the d4 near-duplicate pairs against the assignment. Any
  *    pair straddling two splits is leakage (a val/test doc has a
  *    near-duplicate in train). Reuses the d4 pipeline verbatim plus
  *    one broadcastable split join; the oracle wraps d4's full SQL as
  *    a CTE, so both engines derive the pair set independently.
  *  - d35: dedup threshold-sweep decision table — for each candidate
  *    Jaccard cutoff, how many d4 pairs survive and how many documents
  *    the keep-lowest-id greedy would drop. The sweep is a 5-row
  *    broadcast against the (bounded) verified-pair frame; all counts
  *    exact. The table a data lead reads before picking "dedup at
  *    0.8".
  */
object TextOps24 {
  import Tables.t

  private val SpanN = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d33_span_mask" -> ((spark, dir) => {
      val tk = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= SpanN)
      val pos = tk.select(col("doc_id"), size(col("tk")).as("n_tokens"),
        posexplode(expr(
          s"transform(sequence(0, size(tk) - $SpanN), " +
            s"i -> concat_ws(' ', slice(tk, i + 1, $SpanN)))")))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "span")
      // cross-doc duplicate spans: one shuffle keyed on the span text
      val dup = pos.groupBy("span")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("span"))
      val hits = pos.join(dup, Seq("span"), "left_semi")
        .select(col("doc_id"), col("n_tokens"), col("p"))
      // merge overlapping [p, p+8) intervals per doc: break where the
      // running max end over PRECEDING rows doesn't reach p
      val wPrev = Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
      val isl = hits
        .withColumn("brk",
          when(col("p") > coalesce(max(col("p") + SpanN).over(wPrev),
            lit(-1)), 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(wRun))
      isl.groupBy(col("doc_id"), col("island"))
        .agg(max(col("n_tokens")).as("n_tokens"),
          (max(col("p") + SpanN) - min(col("p"))).as("covered"))
        .groupBy("doc_id")
        .agg(max(col("n_tokens")).as("n_tokens"),
          sum(col("covered")).cast("long").as("masked_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("masked_tokens"),
          round(col("masked_tokens").cast("double")
            / col("n_tokens").cast("double"), 6).as("mask_frac"))
        .orderBy("doc_id")
    }),

    "d34_split_leakage" -> ((spark, dir) => {
      val pairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
        .select(col("a_id"), col("b_id"))
      val sp = t(spark, dir, "documents")
        .select(col("doc_id"),
          (graft.functions.Md5Pack(col("doc_id").cast("string")) % 10)
            .as("m"))
        .select(col("doc_id"),
          when(col("m") < 8, "train").when(col("m") === 8, "val")
            .otherwise("test").as("split"))
      val sa = sp.select(col("doc_id").as("a_id"), col("split").as("split_a"))
      val sb = sp.select(col("doc_id").as("b_id"), col("split").as("split_b"))
      pairs.join(broadcast(sa), "a_id").join(broadcast(sb), "b_id")
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leaky", col("split_a") =!= col("split_b"))
        .orderBy("split_a", "split_b")
    }),

    "d35_threshold_sweep" -> ((spark, dir) => {
      val pairs = TextOps.queries("d4_minhash_pairs")(spark, dir)
      val thr = spark.range(5, 10)
        .select((col("id").cast("double") / 10.0).as("thr"))
      pairs.crossJoin(broadcast(thr))
        .filter(col("jaccard") >= col("thr"))
        .groupBy("thr")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("b_id")).as("docs_removed"))
        .orderBy("thr")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d33_span_mask" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |tk AS (
         |  SELECT doc_id, len(tk) AS n_tokens, tk
         |  FROM d WHERE len(tk) >= $SpanN),
         |pos AS (
         |  SELECT doc_id, n_tokens,
         |    unnest(range(len(tk) - ${SpanN - 1})) AS p,
         |    unnest(list_transform(range(len(tk) - ${SpanN - 1}),
         |      i -> array_to_string(list_slice(tk, i + 1, i + $SpanN), ' ')))
         |      AS span
         |  FROM tk),
         |dup AS (
         |  SELECT span FROM pos GROUP BY span
         |  HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT doc_id, n_tokens, p FROM pos
         |  WHERE span IN (SELECT span FROM dup)),
         |m AS (
         |  SELECT doc_id, n_tokens, p,
         |    CASE WHEN p > coalesce(max(p + $SpanN) OVER (
         |      PARTITION BY doc_id ORDER BY p
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |      THEN 1 ELSE 0 END AS brk
         |  FROM hits),
         |isl AS (
         |  SELECT doc_id, n_tokens, p,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY p
         |      ROWS UNBOUNDED PRECEDING) AS island
         |  FROM m),
         |cov AS (
         |  SELECT doc_id, island, max(n_tokens) AS n_tokens,
         |    max(p + $SpanN) - min(p) AS covered
         |  FROM isl GROUP BY 1, 2)
         |SELECT doc_id, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(covered) AS BIGINT) AS masked_tokens,
         |  round(CAST(sum(covered) AS DOUBLE)
         |    / CAST(max(n_tokens) AS DOUBLE), 6) AS mask_frac
         |FROM cov GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    "d34_split_leakage" -> {
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      s"""WITH pairs AS MATERIALIZED ($d4),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN m < 8 THEN 'train' WHEN m = 8 THEN 'val'
         |      ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ${Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)")} % 10 AS m
         |  FROM documents))
         |SELECT sa.split AS split_a, sb.split AS split_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  sa.split <> sb.split AS leaky
         |FROM pairs
         |JOIN sp sa ON a_id = sa.doc_id
         |JOIN sp sb ON b_id = sb.doc_id
         |GROUP BY 1, 2, 4
         |ORDER BY 1, 2""".stripMargin
    },

    "d35_threshold_sweep" -> {
      val d4 = TextOps.oracleSql("d4_minhash_pairs")
      s"""WITH pairs AS MATERIALIZED ($d4)
         |SELECT thr, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT b_id) AS BIGINT) AS docs_removed
         |FROM pairs
         |CROSS JOIN (SELECT CAST(v AS DOUBLE) / 10.0 AS thr
         |  FROM (VALUES (5), (6), (7), (8), (9)) AS t(v))
         |WHERE jaccard >= thr
         |GROUP BY thr ORDER BY thr""".stripMargin
    },
  )
}
