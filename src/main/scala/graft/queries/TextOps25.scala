package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 46 (SURVEY.md §2.4):
  *
  *  - t30: tokenizer fertility by language — the tokenizer-QA ratio
  *    (regex-BPE tokens per whitespace word, chars per token) that
  *    decides whether a tokenizer under- or over-segments a language.
  *    All corpus sums are exact integers; the two ratios are the only
  *    float steps. One map-side-combinable groupBy(lang).
  *  - s20: embedding coherence of the d4→d8 duplicate clusters — do
  *    near-duplicate TEXTS also sit together in embedding space? The
  *    within-cluster pairwise cosine matrix is bounded by cluster
  *    sizes (near-dup groups, not the corpus), each cosine rounds to
  *    6dp into DECIMAL before the order-free mean. Cross-checks the
  *    lexical (d4) and semantic (embeddings) dedup families against
  *    each other.
  *  - m16: scene-thumbnail selection — the representative frame per m9
  *    scene (peak score, earliest frame on ties), the op a video
  *    pipeline runs to pick preview stills. Reuses m9's scored-frame +
  *    islands chain plus one bounded per-scene argmax window.
  *  - t31: Zipf-head coverage by language — what fraction of all token
  *    occurrences the top-50 corpus tokens absorb. The token-count
  *    frame is the t3 shuffle; the head selection is a bounded
  *    per-lang window over the vocab frame; every mass is an exact
  *    integer sum. The operational dual of t28's Heaps growth: how
  *    much a stopword list would cover.
  *  - m17: cross-media duplicate frames — byte-identical sampled
  *    frames shared by two or more media (the shared intro/outro a
  *    video pipeline stores once). One md5-keyed shuffle over the
  *    frame sample; groups filtered to distinct-media ≥ 2. The
  *    exact-hash complement of m11's perceptual pairs.
  */
object TextOps25 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t30_tokenizer_fertility" -> ((spark, dir) => {
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
      t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"),
          sum(size(regexp_extract_all(col("text"), lit(pat), lit(0)))
            .cast("long")).as("bpe_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("ws_tokens"),
          col("bpe_tokens"), col("n_chars"),
          round(col("bpe_tokens").cast("double")
            / col("ws_tokens").cast("double"), 6).as("fertility"),
          round(col("n_chars").cast("double")
            / col("bpe_tokens").cast("double"), 6).as("chars_per_token"))
        .orderBy("lang")
    }),

    "s20_cluster_coherence" -> ((spark, dir) => {
      val clusters = TextOps.queries("d8_dedup_clusters")(spark, dir)
        .select(col("doc_id"), col("cluster_keeper").as("cluster"))
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
      val a = clusters.join(e, col("doc_id") === col("vec_id"))
        .select(col("cluster"), col("doc_id").as("a_id"),
          col("emb").as("a_emb"))
      val b = clusters.join(e, col("doc_id") === col("vec_id"))
        .select(col("cluster").as("cl_b"), col("doc_id").as("b_id"),
          col("emb").as("b_emb"))
      val pairs = a.join(b, col("cluster") === col("cl_b")
          && col("a_id") < col("b_id"))
        .select(col("cluster"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("a_emb"), col("b_emb")), 6)
            .cast("decimal(10,6)").as("cos"))
      val sizes = clusters.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"))
      pairs.groupBy("cluster")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("cos")).as("sum_cos"))
        .join(broadcast(sizes), "cluster")
        .select(col("cluster"), col("n_members"), col("n_pairs"),
          round(col("sum_cos").cast("double")
            / col("n_pairs").cast("double"), 6).as("mean_cos"))
        .orderBy("cluster")
    }),

    "m16_scene_thumbnail" -> ((spark, dir) => {
      val media = graft.mm.Multimodal
        .mediaFromDocuments(t(spark, dir, "documents")).toDF()
      val scored = graft.mm.Multimodal.sampleFrames(media, 8)
        .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
          size(array_distinct(
            regexp_extract_all(hex(col("frame_bytes")), lit(".."), lit(0))))
            .as("score"))
      val w = Window.partitionBy("media_id").orderBy("frame_idx")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scenes = scored
        .withColumn("prev", lag(col("score"), 1).over(w))
        .withColumn("boundary",
          when(col("prev").isNotNull &&
            abs(col("score") - col("prev")) >= 4, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("scene_id", sum(col("boundary")).over(wRun))
      val wThumb = Window.partitionBy("media_id", "scene_id")
        .orderBy(col("score").desc, col("frame_idx"))
      scenes.withColumn("rk", row_number().over(wThumb))
        .withColumn("n_frames",
          count(lit(1)).over(Window.partitionBy("media_id", "scene_id")))
        .filter(col("rk") === 1)
        .select(col("media_id"), col("scene_id"),
          col("frame_idx").as("thumb_frame"),
          col("score").as("thumb_score"), col("n_frames"))
        .orderBy("media_id", "scene_id")
    }),

    "t31_stopword_coverage" -> ((spark, dir) => {
      val tok = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val wTop = Window.partitionBy("lang")
        .orderBy(col("c").desc, col("tok"))
      val head = tok.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 50)
        .groupBy("lang").agg(sum(col("c")).as("head_mass"))
      val tot = tok.groupBy("lang")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("vocab"))
      tot.join(broadcast(head), "lang")
        .select(col("lang"), col("n_tokens"), col("vocab"),
          col("head_mass"),
          round(col("head_mass").cast("double")
            / col("n_tokens").cast("double"), 6).as("coverage"))
        .orderBy("lang")
    }),

    "m17_frame_dedup" -> ((spark, dir) => {
      val media = graft.mm.Multimodal
        .mediaFromDocuments(t(spark, dir, "documents")).toDF()
      graft.mm.Multimodal.sampleFrames(media, 8)
        .select(col("media_id"), md5(hex(col("frame_bytes"))).as("fh"))
        .groupBy("fh")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("media_id")).as("n_media"),
          min(col("media_id")).as("first_media"))
        .filter(col("n_media") >= 2)
        .orderBy(col("n_frames").desc, col("fh"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t30_tokenizer_fertility" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  round(CAST(sum(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE)
        |    / CAST(sum(len(string_split(text, ' '))) AS DOUBLE), 6)
        |    AS fertility,
        |  round(CAST(sum(length(text)) AS DOUBLE)
        |    / CAST(sum(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE), 6)
        |    AS chars_per_token
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "s20_cluster_coherence" -> {
      val d8 = TextOps.oracleSql("d8_dedup_clusters")
      s"""WITH clusters AS MATERIALIZED (
         |  SELECT doc_id, cluster_keeper AS cluster FROM ($d8) t),
         |e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |pairs AS (
         |  SELECT a.cluster,
         |    CAST(round(list_dot_product(ea.emb, eb.emb) /
         |      (sqrt(list_dot_product(ea.emb, ea.emb))
         |        * sqrt(list_dot_product(eb.emb, eb.emb))), 6)
         |      AS DECIMAL(10,6)) AS cos
         |  FROM clusters a
         |  JOIN clusters b ON a.cluster = b.cluster AND a.doc_id < b.doc_id
         |  JOIN e ea ON ea.vec_id = a.doc_id
         |  JOIN e eb ON eb.vec_id = b.doc_id),
         |sizes AS (
         |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
         |  FROM clusters GROUP BY 1)
         |SELECT cluster, n_members, CAST(count(*) AS BIGINT) AS n_pairs,
         |  round(CAST(sum(cos) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |    AS mean_cos
         |FROM pairs JOIN sizes USING (cluster)
         |GROUP BY cluster, n_members
         |ORDER BY cluster""".stripMargin
    },

    "m16_scene_thumbnail" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT media_id, n_bytes, hx,
        |    CAST(floor(n_bytes / 8) AS INTEGER) AS flen,
        |    unnest(range(8)) AS fi
        |  FROM m),
        |scored AS (
        |  SELECT media_id, CAST(fi AS INTEGER) AS frame_idx,
        |    CAST(len(list_distinct(regexp_extract_all(
        |      substr(hx, CAST(fi * flen * 2 + 1 AS BIGINT),
        |        CAST(2 * (CASE WHEN fi = 7 THEN n_bytes - flen * 7
        |          ELSE flen END) AS BIGINT)), '..'))) AS INTEGER) AS score
        |  FROM f),
        |cuts AS (
        |  SELECT media_id, frame_idx, score,
        |    lag(score) OVER (PARTITION BY media_id ORDER BY frame_idx)
        |      AS prev
        |  FROM scored),
        |fl AS (
        |  SELECT media_id, frame_idx, score,
        |    CASE WHEN prev IS NOT NULL AND abs(score - prev) >= 4
        |      THEN 1 ELSE 0 END AS boundary
        |  FROM cuts),
        |sc AS (
        |  SELECT media_id, frame_idx, score,
        |    CAST(sum(boundary) OVER (PARTITION BY media_id
        |      ORDER BY frame_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS scene_id
        |  FROM fl)
        |SELECT media_id, scene_id, thumb_frame, thumb_score, n_frames
        |FROM (
        |  SELECT media_id, scene_id, frame_idx AS thumb_frame,
        |    score AS thumb_score,
        |    CAST(count(*) OVER (PARTITION BY media_id, scene_id)
        |      AS BIGINT) AS n_frames,
        |    row_number() OVER (PARTITION BY media_id, scene_id
        |      ORDER BY score DESC, frame_idx) AS rk
        |  FROM sc)
        |WHERE rk = 1
        |ORDER BY media_id, scene_id""".stripMargin,

    "t31_stopword_coverage" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |cnt AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |head AS (
        |  SELECT lang, CAST(sum(c) AS BIGINT) AS head_mass FROM (
        |    SELECT lang, c, row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, tok) AS rk
        |    FROM cnt)
        |  WHERE rk <= 50 GROUP BY 1),
        |tot AS (
        |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab
        |  FROM cnt GROUP BY 1)
        |SELECT lang, n_tokens, vocab, head_mass,
        |  round(CAST(head_mass AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS coverage
        |FROM tot JOIN head USING (lang)
        |ORDER BY lang""".stripMargin,

    "m17_frame_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        |    hex(encode(text)) AS hx
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT media_id, n_bytes, hx,
        |    CAST(floor(n_bytes / 8) AS INTEGER) AS flen,
        |    unnest(range(8)) AS fi
        |  FROM m),
        |frames AS (
        |  SELECT media_id,
        |    md5(substr(hx, CAST(fi * flen * 2 + 1 AS BIGINT),
        |      CAST(2 * (CASE WHEN fi = 7 THEN n_bytes - flen * 7
        |        ELSE flen END) AS BIGINT))) AS fh
        |  FROM f)
        |SELECT fh, CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
        |  min(media_id) AS first_media
        |FROM frames GROUP BY fh
        |HAVING count(DISTINCT media_id) >= 2
        |ORDER BY n_frames DESC, fh""".stripMargin,
  )
}
