package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 100 — fingerprint selection + phonetic
  * blocking (SURVEY.md §2.4):
  *
  *  - t49: winnowing fingerprint selection (the MOSS scheme): hash
  *    every 5-token shingle (md5-pack), slide a window of w=4
  *    consecutive hashes, and in each window keep the minimum hash
  *    (ties → rightmost position, via `<=` in a left-to-right fold).
  *    The distinct selected (position, hash) pairs are the document's
  *    fingerprints — winnowing guarantees any shared run of
  *    >= w + k − 1 tokens between two documents shares at least one
  *    fingerprint, at ~2/(w+1) the density of keeping every shingle.
  *    Entirely row-local (bounded HOF folds over the token array — the
  *    shingle stream never crosses a shuffle), then one distinct.
  *  - d48: phonetic blocking over part names — a simplified Soundex
  *    built from engine-portable primitives (translate → collapse
  *    adjacent equal digits via backreference regex → drop the
  *    first-letter digit → strip vowel zeros → pad to 3): per-word
  *    codes joined into a name key. Planted variants prove the
  *    selectivity both ways (the clean catalog's 64 names have no
  *    natural collision): even partkeys with an 'e' get a vowel swap
  *    (e→o — Soundex maps every vowel to the same separator, so the
  *    block key provably cannot change → 100% recovered), odd
  *    partkeys with an 'l' get a liquid swap (l→n crosses digit
  *    classes 4→5 → the key must change → 0% recovered). The
  *    sounds-alike complement of d7's edit-distance blocking: one
  *    map + one groupBy, no pairwise comparison at all.
  */
object TextOps52 {
  import Tables.t

  /** Simplified-Soundex SQL for word expression `w` — Spark flavor
    * (`$1` backreference, regexp_replace replaces all matches).
    */
  private def sparkPhonetic(w: String): String =
    s"""concat(upper(substring($w, 1, 1)),
       |  substring(concat(replace(substring(
       |    regexp_replace(
       |      translate($w, 'abcdefghijklmnopqrstuvwxyz',
       |                '01230120022455012623010202'),
       |      '(\\\\d)\\\\1+', '$$1'),
       |    2), '0', ''), '000'), 1, 3))""".stripMargin

  /** The same code in DuckDB flavor (`\\1` backreference, explicit 'g'
    * flag — DuckDB's regexp_replace is first-match-only by default).
    */
  private def duckPhonetic(w: String): String =
    s"""upper(substring($w, 1, 1)) ||
       |  substring(replace(substring(
       |    regexp_replace(
       |      translate($w, 'abcdefghijklmnopqrstuvwxyz',
       |                '01230120022455012623010202'),
       |      '(\\d)\\1+', '\\1', 'g'),
       |    2), '0', '') || '000', 1, 3)""".stripMargin

  /** Distinct winnowing fingerprints (doc_id, pos, fp_hash) — shared by
    * t49 (the selection itself) and d49 (pairing on shared prints).
    */
  /** @param withPos false drops the position column BEFORE the distinct
    *                 (d49 pairs on hashes only — keeping pos would force
    *                 a second full distinct shuffle downstream)
    */
  private def winnowFps(spark: SparkSession, dir: String,
      withPos: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // toks and hs are bound ONCE per row via single-element
    // transform(array(..), v -> ..) wrappers — as withColumn aliases,
    // CollapseProject would inline the md5 array into the selection
    // lambda, and interpreted HOF evaluation re-computes an inlined
    // subtree on EVERY hs[p] access (measured: ~90 windows × 4 probes
    // × 90 md5s per doc; the sf0.1 bench ran minutes instead of
    // seconds).
    t(spark, dir, "documents")
      .filter(col("text").isNotNull &&
        size(split(col("text"), " ")) >= 8) // >= w+k-1 tokens: >= 1 window
      // Native winnowing kernel: the declarative transform/aggregate
      // formulation this replaces ran nested CodegenFallback lambdas per
      // element (bit-equality with it is pinned in Round9vSpec;
      // measured ~4x on d49 at sf0.1).
      .select(col("doc_id"), explode(
        graft.functions.WinnowPrints(split(col("text"), " "), 5, 4))
        .as("fp"))
      .select(Seq(col("doc_id")) ++
        (if (withPos) Seq(col("fp.p").cast("long").as("pos")) else Nil) ++
        Seq(col("fp.h").as("fp_hash")): _*)
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t49_winnowing" -> ((spark, dir) =>
      winnowFps(spark, dir).orderBy("doc_id", "pos")),

    // Near-dup candidate pairs from shared winnowing fingerprints — the
    // MOSS use-case: two documents sharing any >= w+k−1-token run must
    // share a fingerprint, so grouping the selected prints by hash and
    // expanding capped buckets (BucketedPairs: one shuffle, degenerate
    // hashes dropped whole) finds every such overlap with no pairwise
    // scan. Pairs are scored by shared-print count and the overlap
    // coefficient n_shared / min(|A|, |B|).
    "d49_winnow_pairs" -> ((spark, dir) => {
      val fp = winnowFps(spark, dir, withPos = false)
        .localCheckpoint(true) // feeds both the buckets and the sizes
      val cand = graft.operators.BucketedPairs
        .pairs(fp, Seq("fp_hash"), col("doc_id"), maxBucket = 20)
        .groupBy(col("x").as("a_id"), col("y").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
      val sizes = fp.groupBy("doc_id").agg(count(lit(1)).as("nfp"))
      cand
        .join(sizes.select(col("doc_id").as("a_id"),
          col("nfp").as("nfp_a")), "a_id")
        .join(sizes.select(col("doc_id").as("b_id"),
          col("nfp").as("nfp_b")), "b_id")
        .select(col("a_id"), col("b_id"), col("n_shared"),
          round(col("n_shared").cast("double")
            / least(col("nfp_a"), col("nfp_b")).cast("double"), 6)
            .as("overlap"))
        .orderBy("a_id", "b_id")
    }),

    "d48_soundex_blocks" -> ((spark, dir) => {
      def pkeyOf(c: String): org.apache.spark.sql.Column = expr(
        s"""array_join(transform(split($c, ' '), w ->
           |  ${sparkPhonetic("w")}), '_')""".stripMargin)
      val clean = t(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"))
      val dirty = clean
        .filter(col("p_partkey") % 2 === 0 && col("p_name").contains("e"))
        .select(col("p_partkey"), col("p_name"),
          lit("vowel_swap").as("otype"),
          regexp_replace(col("p_name"), "e", "o").as("dirty_name"))
        .union(clean
          .filter(col("p_partkey") % 2 === 1 && col("p_name").contains("l"))
          .select(col("p_partkey"), col("p_name"),
            lit("liquid_swap").as("otype"),
            regexp_replace(col("p_name"), "l", "n").as("dirty_name")))
      dirty
        .withColumn("recovered", pkeyOf("dirty_name") === pkeyOf("p_name"))
        .groupBy("otype")
        .agg(count(lit(1)).as("n_dirty"),
          count_if(col("recovered")).as("n_recovered"),
          count_if(!col("recovered")).as("n_missed"))
        .orderBy("otype")
    }),
  )

  /** Winnowing-selection CTE chain (d → h → sel), shared by t49/d49. */
  private val winnowCtes: String =
    s"""d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND len(string_split(text, ' ')) >= 8),
       |h AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_transform(range(len(toks) - 4), i ->
       |      ${Tables.duckMd5Pack(
             "array_to_string(list_slice(toks, i + 1, i + 5), ' ')")}
       |    ) AS hs
       |  FROM d),
       |sel AS (
       |  SELECT doc_id, unnest(list_transform(range(len(hs) - 3), j ->
       |    list_reduce(
       |      list_prepend(
       |        struct_pack(h := CAST(9223372036854775807 AS BIGINT),
       |                    p := -1),
       |        list_transform(range(j, j + 4), p ->
       |          struct_pack(h := hs[p + 1], p := p))),
       |      (acc, x) ->
       |        CASE WHEN x.h <= acc.h THEN x ELSE acc END))) AS s
       |  FROM h)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "t49_winnowing" ->
      s"""WITH $winnowCtes
         |SELECT DISTINCT doc_id, CAST((s).p AS BIGINT) AS pos,
         |  (s).h AS fp_hash
         |FROM sel
         |ORDER BY doc_id, pos""".stripMargin,

    "d49_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |fp AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, (s).h AS fp_hash FROM sel),
         |bk AS (
         |  SELECT fp_hash FROM fp
         |  GROUP BY fp_hash HAVING count(*) BETWEEN 2 AND 20),
         |pr AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM fp a
         |  JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
         |  JOIN bk ON a.fp_hash = bk.fp_hash
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfp
         |       FROM fp GROUP BY 1)
         |SELECT a_id, b_id, n_shared,
         |  round(CAST(n_shared AS DOUBLE)
         |    / CAST(least(sa.nfp, sb.nfp) AS DOUBLE), 6) AS overlap
         |FROM pr
         |JOIN sz sa ON a_id = sa.doc_id
         |JOIN sz sb ON b_id = sb.doc_id
         |ORDER BY a_id, b_id""".stripMargin,

    "d48_soundex_blocks" -> {
      def pkeyOf(c: String): String =
        s"""array_to_string(list_transform(string_split($c, ' '),
           |      w -> ${duckPhonetic("w")}), '_')""".stripMargin
      s"""WITH dirty AS (
         |  SELECT p_partkey, p_name, 'vowel_swap' AS otype,
         |    replace(p_name, 'e', 'o') AS dirty_name
         |  FROM part WHERE p_partkey % 2 = 0 AND contains(p_name, 'e')
         |  UNION ALL
         |  SELECT p_partkey, p_name, 'liquid_swap' AS otype,
         |    replace(p_name, 'l', 'n') AS dirty_name
         |  FROM part WHERE p_partkey % 2 = 1 AND contains(p_name, 'l'))
         |SELECT otype, CAST(count(*) AS BIGINT) AS n_dirty,
         |  CAST(count(*) FILTER (${pkeyOf("dirty_name")} =
         |    ${pkeyOf("p_name")}) AS BIGINT) AS n_recovered,
         |  CAST(count(*) FILTER (${pkeyOf("dirty_name")} <>
         |    ${pkeyOf("p_name")}) AS BIGINT) AS n_missed
         |FROM dirty
         |GROUP BY otype
         |ORDER BY otype""".stripMargin
    },
  )
}
