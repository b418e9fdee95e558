package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 70 (SURVEY.md §2.4):
  *
  *  - s37: filtered vector search — the recall question every
  *    metadata-filtered ANN deployment faces: if the index returns a
  *    global top-20 and the label predicate is applied AFTER (cheap
  *    post-filtering), how much of the true filtered top-10 survives?
  *    Ground truth pre-filters then ranks; both legs rank on cosine in
  *    integer micro-units, per-probe shortlists come from bounded
  *    min-k aggregates, and the recall is a raw small-integer quotient
  *    — no rounding anywhere.
  *  - m25: average-hash near-duplicate media — the pHash-family
  *    detector without a codec: 60 md5-derived "luma" cells per media,
  *    hash bit i set iff 60·luma_i > Σluma (exact integer compare),
  *    packed into a 60-bit Long. Candidates must share one of four
  *    15-bit bands (pigeonhole: Hamming ≤ 3 guarantees it), verified
  *    with bit_count(xor) ≤ 3 — the banded-LSH shape of d4 applied to
  *    a perceptual hash, never an all-pairs join.
  */
object TextOps70 {
  import Tables.t

  private val Probes = 5
  private val TopK = 10
  private val PostK = 20
  private val Cells = 60
  private val Bands = 4
  private val BandBits = 15
  private val MaxHam = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s37_filtered_ann" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), col("label"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
        .localCheckpoint(true) // probes + corpus + both ranking legs
      val probes = e.filter(col("vec_id") < Probes)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
      val scored = e.filter(col("vec_id") >= Probes)
        .crossJoin(broadcast(probes))
        .select(col("probe_id"), col("vec_id").as("cand_id"),
          col("label"),
          round(round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("emb")), 6) * 1e6).cast("long").as("c6"))
      def topIds(df: DataFrame, k: Int): DataFrame = df
        .groupBy("probe_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("c6")).as("neg"), col("cand_id").as("id")), k)
          .as("w"))
        .select(col("probe_id"), explode(col("w.id")).as("cand_id"))
      // post-filter leg: global top-20, THEN the label predicate
      val post = topIds(scored, PostK)
        .join(e.select(col("vec_id").as("cand_id"), col("label")),
          "cand_id")
        .filter(col("label") % 2 === 0)
      // ground truth: label predicate first, then top-10
      val truth = topIds(scored.filter(col("label") % 2 === 0), TopK)
      val hits = truth.join(post.select(col("probe_id"), col("cand_id"),
          lit(1L).as("hit")), Seq("probe_id", "cand_id"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_truth"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      val survivors = post.groupBy("probe_id")
        .agg(count(lit(1)).as("n_survivors"))
      hits.join(survivors, Seq("probe_id"), "left")
        .withColumn("n_survivors", coalesce(col("n_survivors"), lit(0L)))
        .select(col("probe_id"), col("n_truth"), col("n_survivors"),
          col("n_hit"),
          (col("n_hit").cast("double") / col("n_truth").cast("double"))
            .as("recall"))
        .orderBy("probe_id")
    }),

    "m25_ahash_neardup" -> ((spark, dir) => {
      val media = graft.mm.Multimodal
        .mediaFromDocuments(t(spark, dir, "documents")).toDF()
        .filter(col("n_bytes") >= Cells)
      val cells = graft.mm.Multimodal.sampleFrames(media, Cells)
        .select(col("media_id"), col("frame_idx"),
          expr("CAST(conv(substr(md5(hex(frame_bytes)), 1, 2), 16, 10)" +
            " AS BIGINT)").as("luma"))
      val tot = cells.groupBy("media_id").agg(sum(col("luma")).as("tot"))
      val hashes = cells.join(tot, "media_id")
        .groupBy("media_id")
        .agg(sum(expr(
          s"CASE WHEN $Cells * luma > tot THEN shiftleft(1L, frame_idx)" +
            " ELSE 0L END")).as("ahash"))
        .localCheckpoint(true) // bands AND the verify join read it
      val bands = hashes.select(col("media_id"), col("ahash"),
        explode(expr(s"sequence(0, ${Bands - 1})")).as("b"))
        .withColumn("bv", expr(
          s"shiftrightunsigned(ahash, b * $BandBits) % ${1 << BandBits}"))
      val pairs = bands.alias("x")
        .join(bands.alias("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("media_a"),
          col("y.media_id").as("media_b"),
          col("x.ahash").as("ha"), col("y.ahash").as("hb"))
        .distinct()
      pairs
        .select(col("media_a"), col("media_b"),
          expr("CAST(bit_count(ha ^ hb) AS INT)").as("hamming"))
        .filter(col("hamming") <= MaxHam)
        .orderBy("media_a", "media_b")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s37_filtered_ann" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT vec_id AS probe_id, emb AS p_emb FROM e
         |  WHERE vec_id < $Probes),
         |scored AS MATERIALIZED (
         |  SELECT p.probe_id, e.vec_id AS cand_id, e.label,
         |    CAST(round(round(list_dot_product(p.p_emb, e.emb) /
         |      (sqrt(list_dot_product(p.p_emb, p.p_emb))
         |        * sqrt(list_dot_product(e.emb, e.emb))), 6)
         |      * 1000000) AS BIGINT) AS c6
         |  FROM e CROSS JOIN p WHERE e.vec_id >= $Probes),
         |post AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id, label, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY c6 DESC, cand_id) AS rk
         |    FROM scored)
         |  WHERE rk <= $PostK AND label % 2 = 0),
         |truth AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id, row_number() OVER (
         |      PARTITION BY probe_id ORDER BY c6 DESC, cand_id) AS rk
         |    FROM scored WHERE label % 2 = 0)
         |  WHERE rk <= $TopK)
         |SELECT t.probe_id,
         |  CAST(count(*) AS BIGINT) AS n_truth,
         |  (SELECT CAST(count(*) AS BIGINT) FROM post s
         |   WHERE s.probe_id = t.probe_id) AS n_survivors,
         |  CAST(count(*) FILTER (p.cand_id IS NOT NULL) AS BIGINT)
         |    AS n_hit,
         |  CAST(count(*) FILTER (p.cand_id IS NOT NULL) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS recall
         |FROM truth t LEFT JOIN post p
         |  ON t.probe_id = p.probe_id AND t.cand_id = p.cand_id
         |GROUP BY t.probe_id ORDER BY t.probe_id""".stripMargin,

    "m25_ahash_neardup" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         |    hex(encode(text)) AS hx
         |  FROM documents WHERE text IS NOT NULL
         |    AND octet_length(encode(text)) >= $Cells),
         |f AS (
         |  SELECT media_id, n_bytes, hx,
         |    CAST(floor(n_bytes / $Cells) AS INTEGER) AS flen,
         |    unnest(range($Cells)) AS fi
         |  FROM m),
         |cells AS (
         |  SELECT media_id, fi,
         |    CAST(concat('0x', substr(md5(substr(hx,
         |      CAST(fi * flen * 2 + 1 AS BIGINT),
         |      CAST(2 * (CASE WHEN fi = ${Cells - 1}
         |        THEN n_bytes - flen * ${Cells - 1}
         |        ELSE flen END) AS BIGINT))), 1, 2)) AS BIGINT) AS luma
         |  FROM f),
         |tot AS (SELECT media_id, CAST(sum(luma) AS BIGINT) AS tot
         |  FROM cells GROUP BY 1),
         |hashes AS MATERIALIZED (
         |  SELECT cells.media_id,
         |    CAST(sum(CASE WHEN $Cells * luma > tot
         |      THEN 1::BIGINT << fi ELSE 0 END) AS BIGINT) AS ahash
         |  FROM cells JOIN tot ON cells.media_id = tot.media_id
         |  GROUP BY 1),
         |bands AS (
         |  SELECT media_id, ahash, unnest(range($Bands)) AS b
         |  FROM hashes),
         |bv AS (
         |  SELECT media_id, ahash, b,
         |    (ahash >> (b * $BandBits)) % ${1 << BandBits} AS bv
         |  FROM bands),
         |pairs AS (
         |  SELECT DISTINCT x.media_id AS media_a, y.media_id AS media_b,
         |    x.ahash AS ha, y.ahash AS hb
         |  FROM bv x JOIN bv y
         |    ON x.b = y.b AND x.bv = y.bv AND x.media_id < y.media_id)
         |SELECT media_a, media_b,
         |  CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
         |FROM pairs WHERE bit_count(xor(ha, hb)) <= $MaxHam
         |ORDER BY media_a, media_b""".stripMargin,
  )
}
