package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 22 (SURVEY.md §2.4):
  *
  *  - q136: scalable exact quartiles — order statistics by RANK
  *    SELECTION instead of sort-and-index: one range-partitioned
  *    GlobalPrefixSum scan ranks every value, the three target ranks
  *    (type-1 quantile, integer-exact ⌊q·(n−1)⌋+1) come from the count
  *    frame, and a tiny equi-join picks the rows. No single-task sort,
  *    no percentile aggregate state — the exact-median path that still
  *    works at 100 TB, next to q18's grouped percentiles and q49's
  *    sampled bounds.
  *  - d26: bloom-accelerated incremental dedup — d17's newest-batch
  *    dedup with the q128 DIY bloom in front: a 65536-bit (1024-word)
  *    bit_or bitmap over the existing corpus' content hashes filters
  *    the new batch to bloom-positive candidates before the exact
  *    hash join; the report counts candidates, true duplicates, and
  *    bloom false positives (the SURVEY-documented bloom swap for
  *    d17, now implemented and oracle-replayed bit-for-bit).
  */
object Analytics20 {
  import Tables.t

  private val BloomBits = 65536L
  private val BloomWords = 1024L
  private val BloomK = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_scalable_median" -> ((spark, dir) => {
      val vals = t(spark, dir, "lineitem")
        .select(col("l_extendedprice").as("v"), col("l_orderkey"),
          col("l_linenumber"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        vals.withColumn("one", lit(1L)),
        struct(col("v").as("s"), col("l_orderkey").as("k1"),
          col("l_linenumber").as("k2")), "one", "rnk")
      val targets = vals.agg(count(lit(1)).as("n"))
        .select(explode(expr(
          """array(
            |  named_struct('quantile', 0.25D,
            |    'target_rank', (n - 1) div 4 + 1),
            |  named_struct('quantile', 0.5D,
            |    'target_rank', (n - 1) div 2 + 1),
            |  named_struct('quantile', 0.75D,
            |    'target_rank', (3 * (n - 1)) div 4 + 1))""".stripMargin))
          .as("t"), col("n"))
        .select(col("t.quantile").as("quantile"),
          col("t.target_rank").as("target_rank"), col("n"))
      ranked.join(broadcast(targets), col("rnk") === col("target_rank"))
        .select(col("quantile"), col("target_rank"), col("n"),
          col("v").as("value"))
        .orderBy("quantile")
    }),

    "d26_bloom_dedup" -> ((spark, dir) => {
      val base = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      // planted guaranteed positives: re-submissions of existing docs
      // (same text ⇒ same hash) arriving in the fresh batch
      val resubmitted = base.filter(col("doc_id") % 25 === 3)
        .select((col("doc_id") + 300000).as("doc_id"), col("text"))
      def hashed(df: DataFrame) = df
        .select(col("doc_id"), graft.functions.Md5Pack(col("text")).as("h"))
        .withColumn("h1", col("h") % 1000003L)
        .withColumn("h2", lit(1L) + expr("h div 2147483648") % 999983L)
      val old = hashed(base.filter(col("doc_id") % 5 =!= 0))
      val fresh = hashed(base.filter(col("doc_id") % 5 === 0)
        .unionByName(resubmitted))
      def positions(df: DataFrame) = df.select(col("doc_id"), col("h"),
        explode(expr(s"transform(sequence(0, ${BloomK - 1}), i -> " +
          s"(h1 + i * h2) % $BloomBits)")).as("pos"))
      val shiftBit = expr("CASE WHEN pos % 64 = 63 THEN " +
        "-9223372036854775808 ELSE shiftleft(1L, CAST(pos % 64 AS INT)) END")
      val bitmap = positions(old)
        .select((col("pos") / 64).cast("long").as("word"),
          shiftBit.as("bits"))
        .groupBy("word").agg(bit_or(col("bits")).as("word_val"))
      val candFlags = positions(fresh)
        .select(col("doc_id"), col("h"),
          (col("pos") / 64).cast("long").as("word"), shiftBit.as("bits"))
        .join(broadcast(bitmap), Seq("word"), "left")
        .groupBy("doc_id", "h")
        .agg(count_if(coalesce(col("word_val"), lit(0L))
          .bitwiseAND(col("bits")) =!= 0).as("n_set"))
        .withColumn("is_cand", col("n_set") === BloomK)
      // exact verify ONLY on bloom-positive candidates (the point of
      // the filter): left_semi against the existing corpus' hashes
      val trueDups = candFlags.filter(col("is_cand"))
        .join(old.select(col("h")).distinct(), Seq("h"), "left_semi")
      candFlags.agg(count(lit(1)).as("n_new"),
          count_if(col("is_cand")).as("n_candidates"))
        .crossJoin(broadcast(old.agg(count(lit(1)).as("n_old"))))
        .crossJoin(broadcast(
          trueDups.agg(count(lit(1)).as("n_true_dups"))))
        .withColumn("n_bloom_fp", col("n_candidates") - col("n_true_dups"))
        .select("n_old", "n_new", "n_candidates", "n_true_dups",
          "n_bloom_fp")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q136_scalable_median" ->
      """WITH ranked AS (
        |  SELECT l_extendedprice AS v, row_number() OVER (
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rnk
        |  FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
        |targets AS (
        |  SELECT 0.25 AS quantile, (n - 1) // 4 + 1 AS target_rank, n
        |  FROM n
        |  UNION ALL
        |  SELECT 0.5, (n - 1) // 2 + 1, n FROM n
        |  UNION ALL
        |  SELECT 0.75, (3 * (n - 1)) // 4 + 1, n FROM n)
        |SELECT CAST(quantile AS DOUBLE) AS quantile,
        |  CAST(target_rank AS BIGINT) AS target_rank, n, v AS value
        |FROM ranked JOIN targets ON rnk = target_rank
        |ORDER BY quantile""".stripMargin,

    "d26_bloom_dedup" -> {
      val h = Tables.duckMd5Pack("text")
      s"""WITH base AS (
         |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         |withplant AS (
         |  SELECT doc_id, text, doc_id % 5 <> 0 AS is_old FROM base
         |  UNION ALL
         |  SELECT doc_id + 300000, text, false FROM base
         |  WHERE doc_id % 25 = 3),
         |hh AS (
         |  SELECT doc_id, is_old, $h AS h,
         |    $h % 1000003 AS h1,
         |    1 + ($h // 2147483648) % 999983 AS h2
         |  FROM withplant),
         |oldd AS (SELECT * FROM hh WHERE is_old),
         |freshd AS (SELECT * FROM hh WHERE NOT is_old),
         |oldpos AS (
         |  SELECT (h1 + r.i * h2) % $BloomBits AS pos
         |  FROM oldd, UNNEST(range($BloomK)) AS r(i)),
         |bitmap AS (
         |  SELECT pos // 64 AS word,
         |    bit_or(CASE WHEN pos % 64 = 63 THEN -9223372036854775808
         |      ELSE (1::BIGINT << CAST(pos % 64 AS INTEGER)) END)
         |      AS word_val
         |  FROM oldpos GROUP BY 1),
         |probe AS (
         |  SELECT doc_id, h, (h1 + r.i * h2) % $BloomBits AS pos
         |  FROM freshd, UNNEST(range($BloomK)) AS r(i)),
         |flags AS (
         |  SELECT doc_id, h,
         |    CAST(count(*) FILTER (WHERE (coalesce(word_val, 0) &
         |      (CASE WHEN pos % 64 = 63 THEN -9223372036854775808
         |        ELSE (1::BIGINT << CAST(pos % 64 AS INTEGER)) END)) <> 0)
         |      AS BIGINT) AS n_set
         |  FROM probe LEFT JOIN bitmap ON pos // 64 = bitmap.word
         |  GROUP BY 1, 2),
         |cand AS (SELECT * FROM flags WHERE n_set = $BloomK),
         |dups AS (
         |  SELECT count(*) AS n_true_dups FROM cand
         |  WHERE h IN (SELECT h FROM oldd)),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_new,
         |    CAST(count(*) FILTER (WHERE n_set = $BloomK) AS BIGINT)
         |      AS n_candidates
         |  FROM flags),
         |no AS (SELECT CAST(count(*) AS BIGINT) AS n_old FROM oldd)
         |SELECT n_old, n_new, n_candidates,
         |  CAST(n_true_dups AS BIGINT) AS n_true_dups,
         |  n_candidates - n_true_dups AS n_bloom_fp
         |FROM agg CROSS JOIN no CROSS JOIN dups""".stripMargin
    },
  )
}
