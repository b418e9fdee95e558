package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 additions, batch 86 (SURVEY.md §2.4) — data-selection and
  * decontamination operators for LLM training corpora:
  *
  *  - t66: DSIR IMPORTANCE RESAMPLING (Xie et al. 2023, "Data Selection
  *    for Language Models via Importance Resampling") — select raw-pool
  *    documents whose hashed-n-gram distribution looks like a target
  *    domain. Features are hashed unigram buckets (Md5Pack mod 1024);
  *    both the target LM and the raw LM are add-one-smoothed bucket
  *    models; a document's log importance weight is the sum over its
  *    tokens of log p_target(b)/p_raw(b); selection is Gumbel-top-k
  *    (deterministic md5-derived uniforms), which samples WITHOUT
  *    replacement proportionally to the importance weights.
  *
  *    Scale shape: two bucket-count aggregations (1024 groups — a
  *    broadcast each), one map-side join per token stream, and the
  *    selection is a bounded sort+limit (TakeOrdered — never a global
  *    window). Cross-engine determinism: each per-token log term is
  *    rounded ONCE into DECIMAL(20,8) (the t9 device), so the per-doc
  *    sums and the Gumbel keys are EXACT decimals on both engines and
  *    the top-k cut cannot be reordered by float noise.
  *
  *  - t67: BENCHMARK CONTAMINATION SWEEP (the GPT-3 appendix-C /
  *    "training-on-the-test-set" discipline) — find training documents
  *    that share any N-token n-gram with a held-out benchmark set
  *    (doc_id % 97 == 0 stands in for the eval suite). Emits, per
  *    contaminated training doc, its distinct n-gram count, how many
  *    of those grams are contaminated, and how many distinct eval docs
  *    it collides with — the report a decontamination pass filters on.
  *    N is 13 in the GPT-3 recipe; here N=4 because the synthetic
  *    corpus is short random-ish text where longer grams never
  *    collide — the operator is N-independent.
  *
  *  - t68: DECONTAMINATED CORPUS REPORT — the ACT half of t67 (the
  *    d61→d63 detect-then-act pairing): every contaminated training
  *    doc is excised and the per-source yield (docs and tokens,
  *    before and after) is reported — the table a curation run
  *    publishes before training starts. All outputs are exact
  *    integers; the scale shape is t67's.
  *
  *    Scale shape: grams hash to 8-byte Md5Pack keys map-side (never
  *    shuffling raw 13-token strings — the d61 lesson), the eval side
  *    is broadcast (benchmark suites are tiny next to the corpus), and
  *    every output is an exact integer count — zero float surface.
  */
object TextOps86 {
  import Tables.t

  private val Buckets = 1024
  private val SelectK = 100
  private val GramN = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t66_dsir_importance" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term"))
        .withColumn("b", pmod(graft.functions.Md5Pack(col("term")),
          lit(Buckets.toLong)))
        .persist()
      val isTarget = col("lang") === "en"
      // add-one-smoothed bucket counts for the two LMs
      val tc = tok.filter(isTarget).groupBy("b")
        .agg(count(lit(1)).as("ct"))
      val sc = tok.filter(!isTarget).groupBy("b")
        .agg(count(lit(1)).as("cs"))
      val totals = tok.agg(
        sum(when(isTarget, 1L).otherwise(0L)).as("tt"),
        sum(when(isTarget, 0L).otherwise(1L)).as("ts"))
      // per-token log-ratio term, rounded ONCE into decimal (t9 device);
      // all four factors are exact BIGINTs well under 2^53
      val lm = spark.range(0, Buckets).select(col("id").as("b"))
        .join(tc, Seq("b"), "left").join(sc, Seq("b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("b"),
          round(log(
            ((coalesce(col("ct"), lit(0L)) + 1L).cast("double")
              * (col("ts") + Buckets).cast("double"))
            / ((coalesce(col("cs"), lit(0L)) + 1L).cast("double")
              * (col("tt") + Buckets).cast("double"))), 8)
            .cast("decimal(20,8)").as("term_lw"))
      // candidates = the raw pool (non-target docs)
      val logw = tok.filter(!isTarget)
        .join(broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("term_lw")).as("lw"))
      // Gumbel-top-k with md5-deterministic uniforms, key kept decimal
      val keyed = logw.withColumn("u",
          (pmod(graft.functions.Md5Pack(
            concat(lit("dsir_"), col("doc_id"))), lit(1000000L)) + 1L)
            .cast("double") / lit(1000001.0d))
        .withColumn("gkey",
          col("lw") + round(-log(-log(col("u"))), 8)
            .cast("decimal(20,8)"))
      keyed.orderBy(col("gkey").desc, col("doc_id")).limit(SelectK)
        .select(col("doc_id"), col("n_tokens"),
          col("lw").cast("double").as("logw"),
          col("gkey").cast("double").as("gumbel_key"))
        .orderBy("doc_id")
    }),

    // The ACT half of t67's detection (the d61→d63 pairing): drop every
    // contaminated training doc and report the per-source yield — the
    // numbers a data-curation run publishes before training. All-integer
    // outputs; the gram join is the same 8-byte-hashed broadcast shape.
    "t68_decontaminated_corpus" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).as("n_tokens"))
      val grams = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= GramN)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(w) - ${GramN - 1})," +
            s" p -> array_join(slice(w, p, $GramN), ' '))")).as("gram"))
        .select(col("doc_id"),
          graft.functions.Md5Pack(col("gram")).as("g"))
        .distinct()
      val isEval = col("doc_id") % 97 === 0
      val contaminated = grams.filter(!isEval)
        .join(broadcast(grams.filter(isEval).select("g")), "g")
        .select("doc_id").distinct()
      val train = docs.filter(!isEval)
        .join(contaminated.withColumn("bad", lit(1L)),
          Seq("doc_id"), "left")
      train.groupBy("source")
        .agg(count(lit(1)).as("docs_before"),
          sum(when(col("bad").isNull, 1L).otherwise(0L))
            .as("docs_after"),
          sum(col("n_tokens")).as("tokens_before"),
          sum(when(col("bad").isNull, col("n_tokens")).otherwise(0L))
            .as("tokens_after"))
        .orderBy("source")
    }),

    "t67_ngram_contamination" -> ((spark, dir) => {
      val grams = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= GramN)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(w) - ${GramN - 1})," +
            s" p -> array_join(slice(w, p, $GramN), ' '))")).as("gram"))
        .select(col("doc_id"),
          graft.functions.Md5Pack(col("gram")).as("g"))
        .distinct()
        .persist()
      val isEval = col("doc_id") % 97 === 0
      val evalGrams = grams.filter(isEval)
        .select(col("doc_id").as("eval_doc"), col("g"))
      val trainGrams = grams.filter(!isEval)
      val perDoc = trainGrams.groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"))
      trainGrams.join(broadcast(evalGrams), "g")
        .groupBy("doc_id")
        .agg(countDistinct(col("g")).as("n_hit"),
          countDistinct(col("eval_doc")).as("n_eval_docs"))
        .join(perDoc, "doc_id")
        .select("doc_id", "n_grams", "n_hit", "n_eval_docs")
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t66_dsir_importance" -> {
      val bucket = s"(${Tables.duckMd5Pack("term")} % $Buckets)"
      val udoc = Tables.duckMd5Pack("'dsir_' || CAST(doc_id AS VARCHAR)")
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |    $bucket AS b
         |  FROM (SELECT doc_id, lang,
         |          unnest(string_split(text, ' ')) AS term
         |        FROM documents WHERE text IS NOT NULL)),
         |tc AS (SELECT b, count(*) AS ct FROM tok
         |       WHERE lang = 'en' GROUP BY b),
         |sc AS (SELECT b, count(*) AS cs FROM tok
         |       WHERE lang <> 'en' GROUP BY b),
         |tot AS (SELECT
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tt,
         |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS ts
         |  FROM tok),
         |lm AS (
         |  SELECT bs.b, CAST(round(ln(
         |      (CAST(coalesce(ct, 0) + 1 AS DOUBLE)
         |        * CAST(ts + $Buckets AS DOUBLE))
         |      / (CAST(coalesce(cs, 0) + 1 AS DOUBLE)
         |        * CAST(tt + $Buckets AS DOUBLE))), 8)
         |    AS DECIMAL(20,8)) AS term_lw
         |  FROM (SELECT unnest(range(0, $Buckets)) AS b) bs
         |  LEFT JOIN tc ON tc.b = bs.b
         |  LEFT JOIN sc ON sc.b = bs.b
         |  CROSS JOIN tot),
         |logw AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |    sum(term_lw) AS lw
         |  FROM tok JOIN lm USING (b)
         |  WHERE lang <> 'en' GROUP BY doc_id),
         |keyed AS (
         |  SELECT doc_id, n_tokens, lw,
         |    lw + CAST(round(-ln(-ln(
         |        CAST(($udoc % 1000000) + 1 AS DOUBLE) / 1000001.0)), 8)
         |      AS DECIMAL(20,8)) AS gkey
         |  FROM logw)
         |SELECT doc_id, n_tokens,
         |  CAST(lw AS DOUBLE) AS logw,
         |  CAST(gkey AS DOUBLE) AS gumbel_key
         |FROM (SELECT * FROM keyed
         |      ORDER BY gkey DESC, doc_id LIMIT $SelectK)
         |ORDER BY doc_id""".stripMargin
    },

    "t68_decontaminated_corpus" -> {
      val gramHash =
        Tables.duckMd5Pack(s"array_to_string(w[p:p+${GramN - 1}], ' ')")
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents
         |  WHERE text IS NOT NULL
         |    AND len(string_split(text, ' ')) >= $GramN),
         |grams AS (
         |  SELECT DISTINCT doc_id, $gramHash AS g
         |  FROM (SELECT doc_id, w,
         |          unnest(range(1, len(w) - ${GramN - 2})) AS p
         |        FROM ws)),
         |bad AS (
         |  SELECT DISTINCT tg.doc_id
         |  FROM (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0) tg
         |  JOIN (SELECT g FROM grams WHERE doc_id % 97 = 0) eg
         |  USING (g)),
         |train AS (
         |  SELECT d.doc_id, d.source,
         |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |    (bad.doc_id IS NOT NULL) AS is_bad
         |  FROM documents d LEFT JOIN bad ON bad.doc_id = d.doc_id
         |  WHERE d.text IS NOT NULL AND d.doc_id % 97 <> 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
         |  CAST(sum(CASE WHEN is_bad THEN 0 ELSE 1 END) AS BIGINT)
         |    AS docs_after,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
         |  CAST(sum(CASE WHEN is_bad THEN 0 ELSE n_tokens END) AS BIGINT)
         |    AS tokens_after
         |FROM train GROUP BY source ORDER BY source""".stripMargin
    },

    "t67_ngram_contamination" -> {
      val gramHash =
        Tables.duckMd5Pack(s"array_to_string(w[p:p+${GramN - 1}], ' ')")
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents
         |  WHERE text IS NOT NULL
         |    AND len(string_split(text, ' ')) >= $GramN),
         |grams AS (
         |  SELECT DISTINCT doc_id, $gramHash AS g
         |  FROM (SELECT doc_id, w,
         |          unnest(range(1, len(w) - ${GramN - 2})) AS p
         |        FROM ws)),
         |eg AS (SELECT doc_id AS eval_doc, g FROM grams
         |       WHERE doc_id % 97 = 0),
         |tg AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |       FROM tg GROUP BY doc_id)
         |SELECT tg.doc_id, pd.n_grams,
         |  CAST(count(DISTINCT tg.g) AS BIGINT) AS n_hit,
         |  CAST(count(DISTINCT eg.eval_doc) AS BIGINT) AS n_eval_docs
         |FROM tg JOIN eg USING (g) JOIN pd ON pd.doc_id = tg.doc_id
         |GROUP BY tg.doc_id, pd.n_grams
         |ORDER BY tg.doc_id""".stripMargin
    },
  )
}
