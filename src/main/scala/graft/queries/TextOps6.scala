package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 text/similarity additions, batch 2 (SURVEY.md §2.4):
  *
  *  - s6: hybrid retrieval — BM25 keyword scoring fused with embedding
  *    cosine by reciprocal-rank fusion (RRF, k=60). The two legs are the
  *    engine's existing machinery (token explode + bounded min-k for the
  *    keyword side; the codegen'd cosine for the vector side); the fusion
  *    is a full-outer join of two ≤100-row rank frames. Both top-k
  *    selections go through the bounded TopKAgg — at most k candidates
  *    per map partition cross the shuffle, no global sort anywhere.
  *  - t23: lexical-diversity profile per document — type-token ratio,
  *    Simpson repeat concentration (Σ f(f-1) / n(n-1)), top-token share.
  *    Everything is integer aggregation until the final divisions, so
  *    the cross-engine boundary is exact.
  */
object TextOps6 {
  import Tables.t

  /** Fixed keyword query for s6 — mid-frequency vocabulary terms. */
  private val Terms = Seq("customer", "vector", "stream")
  private val K1 = 1.2
  private val B = 0.75
  // Derived constants computed ONCE in Scala and rendered to both
  // engines so neither re-derives them in its own float arithmetic.
  private val K1p1 = K1 + 1.0
  private val OneMinusB = 1.0 - B
  private def lit17(v: Double): String = f"CAST($v%.17g AS DOUBLE)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Hybrid search: BM25 over the token stream + cosine against the
    // vec_id-0 probe, RRF-fused. Per-term BM25 contributions are rounded
    // into DECIMAL before the per-doc sum so term order is immaterial;
    // both rank lists are bounded aggregates (k=100), so the fusion join
    // runs on two broadcast-scale frames.
    "s6_hybrid_rrf" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
      val dl = docs.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
      val stats = dl.agg(
        count(lit(1)).as("n_docs"),
        round(sum("dl").cast("double") / count(lit(1)), 6).as("avgdl"))
      val tf = docs
        .select(col("doc_id"), explode(col("tk")).as("tok"))
        .filter(col("tok").isin(Terms: _*))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(df), "tok")
        // dl is corpus-sized (one row per doc) — NO broadcast hint; the
        // doc-keyed join shuffles at scale and AQE broadcasts it at
        // small SF on its own
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("term_score",
          round(col("idf") * col("tf") * lit(K1p1) /
            (col("tf") + lit(K1) * (lit(OneMinusB) +
              lit(B) * col("dl") / col("avgdl"))), 8)
            .cast("decimal(28,8)"))
        .groupBy("doc_id")
        .agg(sum("term_score").as("kw_score"))
      val kwTop = scored
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("kw_score")).as("neg"), col("doc_id").as("id")), 100)
          .as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("id"),
          (col("pos") + 1).cast("int").as("kw_rank"))
      val e = t(spark, dir, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("p_emb"))
      val cos = e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"),
          round(graft.functions.VectorOps.cosine(col("embedding"),
            col("p_emb")), 6).as("cos"))
      val vecTop = cos
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("cos")).as("neg"), col("vec_id").as("id")), 100)
          .as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("id"),
          (col("pos") + 1).cast("int").as("vec_rank"))
      kwTop.join(vecTop, Seq("id"), "full_outer")
        .withColumn("rrf",
          round(coalesce(lit(1.0) / (lit(60) + col("kw_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 8))
        .orderBy(col("rrf").desc, col("id"))
        .limit(20)
        .select("id", "kw_rank", "vec_rank", "rrf")
    }),

    // Semantic blocked dedup (SemDeDup-style): vectors sharing their
    // ENTIRE 4-subspace PQ code are near-duplicate candidates — the
    // code equality is the blocking key, cosine the verifier. Encode is
    // the same map-only literal-codebook argmin s5 uses (no shuffle to
    // build the index), candidate expansion runs through the capped
    // BucketedPairs walk, verification joins embeddings back only for
    // candidates. The third embedding-dedup scale path next to d10
    // (hyperplane LSH) and d14 (keep list) — PQ codes block FAR tighter
    // than 6-bit LSH buckets, so the verify set stays small even where
    // LSH buckets saturate.
    "d20_semantic_block_dedup" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
      // one-pass codegen'd normalize + bounded-id codebook filter — the
      // s5 devices (see TextOps5 for why the HOF/hoist forms regress)
      val vecs = e.select(col("vec_id"),
        graft.functions.GraftFunctions.l2Normalize(col("embedding"))
          .as("emb"))
      val cbIds = e.select(col("vec_id"),
          graft.functions.Md5Pack(col("vec_id").cast("string")).as("_h"))
        .orderBy(col("_h"), col("vec_id")).limit(16)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val cb = graft.operators.AnnPq.codebook(
        vecs.filter(col("vec_id").isin(cbIds: _*)), "vec_id", "emb", 16)
      val coded = graft.operators.AnnPq.withCodes(vecs, "emb", cb, m = 4)
        .select(col("vec_id"),
          array_join(col("codes").cast("array<string>"), "-").as("ckey"))
      val cand = graft.operators.BucketedPairs
        .pairs(coded, Seq("ckey"), col("vec_id"), maxBucket = 500)
        .select(col("x").as("a_id"), col("y").as("b_id"))
      val emb = e.select(col("vec_id"), col("embedding"))
      cand
        .join(emb.select(col("vec_id").as("a_id"),
          col("embedding").as("a_emb")), "a_id")
        .join(emb.select(col("vec_id").as("b_id"),
          col("embedding").as("b_emb")), "b_id")
        .select(col("a_id"), col("b_id"),
          round(graft.functions.VectorOps.cosine(col("a_emb"), col("b_emb")),
            6).as("cos"))
        .orderBy("a_id", "b_id")
    }),

    // Dedup yield curve — the economics view of dedup over arriving
    // batches: each unique content hash is attributed to the batch that
    // FIRST contributed it (min-batch per hash, one map-side-combinable
    // aggregation), giving per-batch new-unique counts, the cumulative
    // distinct curve, and the duplicate rate. The window runs on the
    // batch frame (bounded by batch count), never the corpus; this is
    // the report that decides whether the next crawl increment is still
    // worth ingesting.
    "d21_dedup_yield" -> ((spark, dir) => {
      val docs = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(expr("CAST(doc_id div 100 AS INT)").as("batch"),
          md5(col("text")).as("h"))
      val perBatch = docs.groupBy("batch").agg(count(lit(1)).as("n_docs"))
      val firstPer = docs.groupBy("h").agg(min("batch").as("first_batch"))
        .groupBy(col("first_batch").as("batch"))
        .agg(count(lit(1)).as("n_new_unique"))
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("batch")
      perBatch.join(firstPer, Seq("batch"), "left")
        .withColumn("n_new_unique", coalesce(col("n_new_unique"), lit(0L)))
        .withColumn("cum_unique", sum("n_new_unique").over(wCum))
        .withColumn("dup_rate", round(lit(1.0) -
          col("n_new_unique").cast("double") / col("n_docs"), 6))
        .orderBy("batch")
    }),

    // Lexical diversity: per-doc token frequency spectrum folded to
    // type-token ratio, Simpson concentration, and top-token share.
    // Integer counts cross the shuffle; divisions happen once per doc.
    "t23_lexical_diversity" -> ((spark, dir) =>
      t(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("f"))
        .groupBy("doc_id")
        .agg(
          sum("f").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("f") * (col("f") - 1)).as("sum_ff"),
          max("f").as("max_f"))
        .select(
          col("doc_id"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens"), 6)
            .as("ttr"),
          when(col("n_tokens") > 1,
            round(col("sum_ff").cast("double") /
              (col("n_tokens") * (col("n_tokens") - 1)), 6)).as("simpson"),
          round(col("max_f").cast("double") / col("n_tokens"), 6)
            .as("top_share"))
        .orderBy("doc_id")),
  )

  val oracleSql: Map[String, String] = Map(
    "s6_hybrid_rrf" -> {
      val terms = Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH d AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM d),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    round(CAST(sum(dl) AS DOUBLE) / count(*), 6) AS avgdl
         |  FROM dl),
         |tf AS (
         |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(tk) AS tok FROM d)
         |  WHERE tok IN ($terms) GROUP BY 1, 2),
         |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (
         |  SELECT doc_id,
         |    sum(CAST(round(
         |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
         |        * tf * ${lit17(K1p1)}
         |        / (tf + ${lit17(K1)} * (${lit17(OneMinusB)}
         |          + ${lit17(B)} * dl / avgdl)), 8)
         |      AS DECIMAL(28,8))) AS kw_score
         |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id)
         |    CROSS JOIN stats
         |  GROUP BY 1),
         |kw AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY kw_score DESC, doc_id)
         |      AS INTEGER) AS kw_rank
         |  FROM sc QUALIFY kw_rank <= 100),
         |e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |q AS (SELECT emb AS p_emb FROM e WHERE vec_id = 0),
         |cos AS (
         |  SELECT e.vec_id,
         |    round(list_dot_product(e.emb, p_emb) /
         |      (sqrt(list_dot_product(e.emb, e.emb))
         |        * sqrt(list_dot_product(p_emb, p_emb))), 6) AS cos
         |  FROM e CROSS JOIN q WHERE e.vec_id <> 0),
         |vr AS (
         |  SELECT vec_id AS id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id)
         |      AS INTEGER) AS vec_rank
         |  FROM cos QUALIFY vec_rank <= 100),
         |f AS (
         |  SELECT coalesce(kw.id, vr.id) AS id, kw_rank, vec_rank,
         |    round(coalesce(1.0 / (60 + kw_rank), 0.0)
         |      + coalesce(1.0 / (60 + vec_rank), 0.0), 8) AS rrf
         |  FROM kw FULL OUTER JOIN vr ON kw.id = vr.id)
         |SELECT id, kw_rank, vec_rank, rrf FROM f
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin
    },

    "d20_semantic_block_dedup" -> {
      val M = 4
      val Sub = 64 / M
      val encScore =
        "list_dot_product(cs, cs) - 2 * list_dot_product(vs, cs)"
      s"""WITH vecs0 AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |vecs AS (
         |  SELECT vec_id, e0, list_transform(e0,
         |    x -> x / sqrt(list_dot_product(e0, e0))) AS emb
         |  FROM vecs0),
         |cb AS (
         |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS k, emb
         |  FROM (
         |    SELECT vec_id, emb,
         |      ${Tables.duckMd5Pack("CAST(vec_id AS VARCHAR)")} AS h
         |    FROM vecs ORDER BY h, vec_id LIMIT 16)),
         |enc AS (
         |  SELECT vec_id, m, k FROM (
         |    SELECT v.vec_id, s.m, c.k,
         |      row_number() OVER (PARTITION BY v.vec_id, s.m
         |        ORDER BY $encScore, c.k) AS rn
         |    FROM vecs v
         |    CROSS JOIN (SELECT unnest(range($M)) AS m) s
         |    CROSS JOIN cb c,
         |    LATERAL (SELECT list_slice(v.emb, CAST(s.m*$Sub+1 AS INTEGER),
         |        CAST(s.m*$Sub+$Sub AS INTEGER)) AS vs,
         |      list_slice(c.emb, CAST(s.m*$Sub+1 AS INTEGER),
         |        CAST(s.m*$Sub+$Sub AS INTEGER)) AS cs) x)
         |  WHERE rn = 1),
         |keys AS (
         |  SELECT vec_id,
         |    string_agg(CAST(k AS VARCHAR), '-' ORDER BY m) AS ckey
         |  FROM enc GROUP BY vec_id),
         |buck AS (
         |  SELECT ckey FROM keys
         |  GROUP BY 1 HAVING count(*) BETWEEN 2 AND 500)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(list_dot_product(va.e0, vb.e0) /
         |    (sqrt(list_dot_product(va.e0, va.e0)) *
         |     sqrt(list_dot_product(vb.e0, vb.e0))), 6) AS cos
         |FROM keys a JOIN keys b ON a.ckey = b.ckey
         |                       AND a.vec_id < b.vec_id
         |JOIN buck ON a.ckey = buck.ckey
         |JOIN vecs va ON va.vec_id = a.vec_id
         |JOIN vecs vb ON vb.vec_id = b.vec_id
         |ORDER BY a_id, b_id""".stripMargin
    },

    "d21_dedup_yield" ->
      """WITH d AS (
        |  SELECT CAST(doc_id // 100 AS INTEGER) AS batch, md5(text) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |pb AS (
        |  SELECT batch, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY 1),
        |fp AS (
        |  SELECT first_batch AS batch,
        |    CAST(count(*) AS BIGINT) AS n_new_unique
        |  FROM (SELECT h, min(batch) AS first_batch FROM d GROUP BY 1)
        |  GROUP BY 1)
        |SELECT pb.batch, n_docs,
        |  coalesce(n_new_unique, 0) AS n_new_unique,
        |  CAST(sum(coalesce(n_new_unique, 0)) OVER (ORDER BY pb.batch)
        |    AS BIGINT) AS cum_unique,
        |  round(CAST(1 AS DOUBLE)
        |    - CAST(coalesce(n_new_unique, 0) AS DOUBLE) / n_docs, 6)
        |    AS dup_rate
        |FROM pb LEFT JOIN fp USING (batch)
        |ORDER BY batch""".stripMargin,

    "t23_lexical_diversity" ->
      """WITH freq AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS f
        |  FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    CAST(sum(f * (f - 1)) AS BIGINT) AS sum_ff,
        |    CAST(max(f) AS BIGINT) AS max_f
        |  FROM freq GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
        |  CASE WHEN n_tokens > 1 THEN
        |    round(CAST(sum_ff AS DOUBLE) / (n_tokens * (n_tokens - 1)), 6)
        |  END AS simpson,
        |  round(CAST(max_f AS DOUBLE) / n_tokens, 6) AS top_share
        |FROM agg ORDER BY doc_id""".stripMargin,
  )
}
