package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 10 (SURVEY.md §2.4):
  *
  *  - s12: MMR-diversified retrieval (maximal marginal relevance) — the
  *    re-ranking step between ANN recall and a RAG prompt: three greedy
  *    selections unrolled, each maximizing λ·relevance −
  *    (1−λ)·max-similarity-to-already-selected over the probe's top-20
  *    candidate pool. Every frame is probes×pool-bounded; arg-maxes run
  *    through the bounded min-k aggregate, never a window over the
  *    corpus.
  *  - m11: perceptual-hash visual near-dup — a 62-bit dHash over evenly
  *    sampled byte pairs of each medium (monotone under small local
  *    edits, unlike content md5), banded into 4×16-bit LSH buckets via
  *    the shared `BucketedPairs` machinery, verified by Hamming ≤ 6.
  *    Planted same-length single-byte variants guarantee true positives
  *    whose hashes differ only near the edit. The multimodal member of
  *    the dedup family (d1 exact / d4 MinHash / d5 SimHash / d20 PQ).
  *  - d24: consistent-hash shard assignment + rebalancing audit — docs
  *    land on the clockwise-successor virtual node of a 32-vnodes-per-
  *    shard ring (md5-packed positions rendered once into both
  *    engines); growing the ring 8→10 shards moves only the slices the
  *    new shards claim, and the report contrasts that with the ~80%
  *    churn a mod-N scheme costs. Rings are constant literal frames
  *    broadcast against one corpus scan; arg-mins via bounded min-k.
  */
object TextOps10 {
  import Tables.t

  private val MmrPool = 20
  private val HamMax = 6

  // ---- d24: virtual-node ring positions (md5-packed, rendered once) ----
  private val RingSpace = 1L << 62
  private def vnodeHash(config: String, shard: Int, v: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ring:$config:$shard:$v".getBytes("UTF-8"))
    val hx = d.map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hx.substring(0, 15), 16) % 2147483647L) *
      2147483648L +
      (java.lang.Long.parseLong(hx.substring(15, 30), 16) % 2147483647L)
  }
  private def ring(config: String, nShards: Int): Seq[(Long, Int)] =
    for (s <- 0 until nShards; v <- 0 until 32)
      yield (vnodeHash(config, s, v), s)
  private def ringValuesSql(r: Seq[(Long, Int)]): String =
    r.map { case (vh, s) => s"($vh, $s)" }.mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s12_mmr" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
      val probes = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("p_id"), col("emb").as("p_emb"))
      val corpus = e.select(col("vec_id").as("n_id"), col("emb").as("n_emb"))
      val pool = corpus.crossJoin(broadcast(probes))
        .filter(col("n_id") =!= col("p_id"))
        .select(col("p_id"), col("n_id"),
          round(graft.functions.GraftFunctions.cosineSim(
            col("p_emb"), col("n_emb")), 6).as("rel"))
        .groupBy("p_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("rel")).as("neg"), col("n_id").as("id")), MmrPool)
          .as("top"))
        .select(col("p_id"), explode(col("top")).as("m"))
        .select(col("p_id"), col("m.id").as("n_id"), (-col("m.neg")).as("rel"))
        .join(corpus, Seq("n_id"))
        .persist()
      pool.count()
      def argmax(df: DataFrame, score: String) = df.groupBy("p_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col(score)).as("neg"), col("n_id").as("id")), 1).as("w"))
        .select(col("p_id"), col("w")(0)("id").as("sel_id"),
          (-col("w")(0)("neg")).as("sel_score"))
      val sel1 = argmax(pool, "rel")
      val sel1e = sel1.join(corpus.select(col("n_id").as("sel_id"),
        col("n_emb").as("s1_emb")), Seq("sel_id"))
        .select(col("p_id"), col("sel_id").as("s1_id"),
          col("sel_score").as("s1_score"), col("s1_emb"))
      // λ·rel − (1−λ)·sim in EXACT DECIMAL: the inputs are rounded-6
      // doubles (exact as DECIMAL(9,6)), so the combination never
      // re-rounds a float — a round(double, 6) here landed on a .5-ulp
      // boundary where Spark (exact BigDecimal HALF_UP) and DuckDB
      // (float-path rounding) disagree by one last digit
      val pool2 = pool.join(broadcast(sel1e), Seq("p_id"))
        .filter(col("n_id") =!= col("s1_id"))
        .withColumn("sim1", round(graft.functions.GraftFunctions.cosineSim(
          col("n_emb"), col("s1_emb")), 6))
        .withColumn("mmr2", expr(
          "CAST(0.7 AS DECIMAL(2,1)) * CAST(rel AS DECIMAL(9,6)) - " +
            "CAST(0.3 AS DECIMAL(2,1)) * CAST(sim1 AS DECIMAL(9,6))"))
      val sel2 = argmax(pool2, "mmr2")
      val sel2e = sel2.join(corpus.select(col("n_id").as("sel_id"),
        col("n_emb").as("s2_emb")), Seq("sel_id"))
        .select(col("p_id"), col("sel_id").as("s2_id"),
          col("sel_score").as("s2_score"), col("s2_emb"))
      val pool3 = pool2.join(broadcast(sel2e), Seq("p_id"))
        .filter(col("n_id") =!= col("s2_id"))
        .withColumn("sim2", round(graft.functions.GraftFunctions.cosineSim(
          col("n_emb"), col("s2_emb")), 6))
        .withColumn("mmr3", expr(
          "CAST(0.7 AS DECIMAL(2,1)) * CAST(rel AS DECIMAL(9,6)) - " +
            "CAST(0.3 AS DECIMAL(2,1)) * " +
            "CAST(greatest(sim1, sim2) AS DECIMAL(9,6))"))
      val sel3 = argmax(pool3, "mmr3")
      sel1.select(col("p_id"), lit(1).as("rank"),
          col("sel_id"), col("sel_score").cast("double").as("score"))
        .unionByName(sel2.select(col("p_id"), lit(2).as("rank"),
          col("sel_id"), col("sel_score").cast("double").as("score")))
        .unionByName(sel3.select(col("p_id"), lit(3).as("rank"),
          col("sel_id"), col("sel_score").cast("double").as("score")))
        .orderBy("p_id", "rank")
    }),

    "d24_consistent_shards" -> ((spark, dir) => {
      import spark.implicits._
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Md5Pack(col("doc_id").cast("string")).as("h"))
      def assign(config: String, nShards: Int, out: String) = {
        val vn = ring(config, nShards).toDF("vh", "shard")
        // clockwise successor on the ring: min (vh − h) mod 2^62
        docs.crossJoin(broadcast(vn))
          .select(col("doc_id"), col("h"),
            expr(s"((vh - h) % $RingSpace + $RingSpace) % $RingSpace")
              .as("dist"), col("shard"))
          .groupBy("doc_id", "h")
          .agg(graft.functions.TopKAgg.minK(
            struct(col("dist"), col("shard")), 1).as("w"))
          .select(col("doc_id"), col("h"),
            col("w")(0)("shard").as(out))
      }
      // the grown ring KEEPS the original vnodes (same hash namespace)
      // and only adds shards 8-9 — that containment is what makes
      // consistent hashing move ~2/10 of keys instead of ~4/5
      val a = assign("A", 8, "shard_a")
      val b = assign("A", 10, "shard_b").select(col("doc_id").as("d2"),
        col("shard_b"))
      a.join(b, col("doc_id") === col("d2"))
        .select(col("doc_id"), col("h"), col("shard_a"), col("shard_b"))
        .groupBy("shard_a")
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("shard_a") =!= col("shard_b")).as("n_moved_ring"),
          count_if((col("h") % 8) =!= (col("h") % 10)).as("n_moved_mod"))
        .withColumn("ring_moved_frac",
          round(col("n_moved_ring").cast("double") / col("n_docs"), 6))
        .orderBy("shard_a")
    }),

    "m11_phash_neardup" -> ((spark, dir) => {
      val base = t(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"), col("text"))
      // planted same-length variants: first byte flipped to 'X' — the
      // sampled byte positions stay identical, so the hash moves only
      // near the edit (guaranteed Hamming-near true positives)
      val planted = base.filter(col("media_id") % 25 === 0)
        .select((col("media_id") + 100000).as("media_id"),
          concat(lit("X"), expr("substring(text, 2)")).as("text"))
      // 62-bit dHash: bit i = byte[p_i] > byte[p_i+1] at evenly spread
      // positions (62 bits, not 64 — the SimHash precedent keeps the
      // pack inside a positive Long under ANSI mode). The m10 lesson
      // applies verbatim: explode the bit-index sequence FIRST and
      // decode/compare as codegen'd expressions, packing through an
      // order-free sum of distinct powers of two — the interpreted
      // 62-step aggregate fold measured 5.6-5.9s at sf0.1 (with or
      // without a persist barrier); this shape ~1s.
      val h = base.unionByName(planted)
        .select(col("media_id"), hex(encode(col("text"), "UTF-8")).as("hx"),
          octet_length(encode(col("text"), "UTF-8")).as("nb"))
        .filter(col("nb") >= 2)
        .select(col("media_id"), col("hx"), col("nb"),
          explode(expr("sequence(0L, 61L)")).as("i"))
        .select(col("media_id"), expr(
          """CASE WHEN
            |  CAST(conv(substring(hx,
            |    CAST((i * (nb - 2) div 62) * 2 + 1 AS INT), 2), 16, 10)
            |    AS BIGINT) >
            |  CAST(conv(substring(hx,
            |    CAST(((i * (nb - 2) div 62) + 1) * 2 + 1 AS INT), 2),
            |    16, 10) AS BIGINT)
            |THEN shiftleft(1L, CAST(61 - i AS INT)) ELSE 0L END"""
            .stripMargin).as("bit"))
        .groupBy("media_id").agg(sum("bit").as("phash"))
        .persist()
      h.count()
      val bands = h.select(col("media_id"), col("phash"),
          explode(expr("transform(sequence(0, 3), b -> named_struct(" +
            "'band_id', b, 'band_val', shiftright(phash, b * 16) & 65535))"))
            .as("band"))
        .select(col("media_id"), col("phash"),
          col("band.band_id").as("band_id"),
          col("band.band_val").as("band_val"))
      graft.operators.BucketedPairs.pairs(bands,
          Seq("band_id", "band_val"),
          struct(col("media_id").as("id"), col("phash").as("ph")), 100)
        .select(col("x.id").as("a_id"), col("x.ph").as("a_ph"),
          col("y.id").as("b_id"), col("y.ph").as("b_ph"))
        .distinct()
        .select(col("a_id"), col("b_id"),
          bit_count(col("a_ph").bitwiseXOR(col("b_ph"))).as("hamming"))
        .filter(col("hamming") <= HamMax)
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "s12_mmr" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT vec_id AS p_id, emb AS p_emb FROM e
         |      WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT p_id, e.vec_id AS n_id, e.emb AS n_emb,
         |    round(list_dot_product(p_emb, e.emb) /
         |      (sqrt(list_dot_product(p_emb, p_emb))
         |        * sqrt(list_dot_product(e.emb, e.emb))), 6) AS rel
         |  FROM e CROSS JOIN p WHERE e.vec_id <> p_id),
         |pool AS (
         |  SELECT p_id, n_id, n_emb, rel FROM (
         |    SELECT p_id, n_id, n_emb, rel, row_number() OVER (
         |      PARTITION BY p_id ORDER BY rel DESC, n_id) AS rn
         |    FROM scored) WHERE rn <= $MmrPool),
         |s1 AS (
         |  SELECT p_id, n_id AS s1_id, n_emb AS s1_emb, rel AS s1_score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY p_id
         |    ORDER BY rel DESC, n_id) AS rn FROM pool) WHERE rn = 1),
         |pool2pre AS (
         |  SELECT pool.p_id, n_id, n_emb, rel, s1_id, s1_score,
         |    round(list_dot_product(n_emb, s1_emb) /
         |      (sqrt(list_dot_product(n_emb, n_emb))
         |        * sqrt(list_dot_product(s1_emb, s1_emb))), 6) AS sim1
         |  FROM pool JOIN s1 ON pool.p_id = s1.p_id
         |  WHERE n_id <> s1_id),
         |pool2 AS (
         |  SELECT *, CAST(0.7 AS DECIMAL(2,1)) * CAST(rel AS DECIMAL(9,6))
         |    - CAST(0.3 AS DECIMAL(2,1)) * CAST(sim1 AS DECIMAL(9,6))
         |    AS mmr2
         |  FROM pool2pre),
         |s2 AS (
         |  SELECT p_id, n_id AS s2_id, n_emb AS s2_emb, mmr2 AS s2_score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY p_id
         |    ORDER BY mmr2 DESC, n_id) AS rn FROM pool2) WHERE rn = 1),
         |pool3 AS (
         |  SELECT pool2.p_id, n_id, rel, sim1, s2_id, s2_score,
         |    CAST(0.7 AS DECIMAL(2,1)) * CAST(rel AS DECIMAL(9,6))
         |    - CAST(0.3 AS DECIMAL(2,1)) * CAST(greatest(sim1,
         |        round(list_dot_product(n_emb, s2_emb) /
         |          (sqrt(list_dot_product(n_emb, n_emb))
         |            * sqrt(list_dot_product(s2_emb, s2_emb))), 6))
         |        AS DECIMAL(9,6)) AS mmr3
         |  FROM pool2 JOIN s2 ON pool2.p_id = s2.p_id
         |  WHERE n_id <> s2_id),
         |s3 AS (
         |  SELECT p_id, n_id AS s3_id, mmr3 AS s3_score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY p_id
         |    ORDER BY mmr3 DESC, n_id) AS rn FROM pool3) WHERE rn = 1)
         |SELECT p_id, rank, sel_id, score FROM (
         |  SELECT p_id, 1 AS rank, s1_id AS sel_id,
         |    CAST(s1_score AS DOUBLE) AS score
         |  FROM s1
         |  UNION ALL
         |  SELECT p_id, 2, s2_id, CAST(s2_score AS DOUBLE) FROM s2
         |  UNION ALL
         |  SELECT p_id, 3, s3_id, CAST(s3_score AS DOUBLE) FROM s3)
         |ORDER BY p_id, rank""".stripMargin,

    "d24_consistent_shards" -> {
      val docHash = Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)")
      s"""WITH docs AS (
         |  SELECT doc_id, $docHash AS h FROM documents),
         |va(vh, shard) AS (VALUES ${ringValuesSql(ring("A", 8))}),
         |vb(vh, shard) AS (VALUES ${ringValuesSql(ring("A", 10))}),
         |da AS (
         |  SELECT doc_id, h, shard AS shard_a FROM (
         |    SELECT doc_id, h, shard, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY
         |        ((vh - h) % $RingSpace + $RingSpace) % $RingSpace, shard)
         |      AS rn
         |    FROM docs CROSS JOIN va) WHERE rn = 1),
         |db AS (
         |  SELECT doc_id, shard AS shard_b FROM (
         |    SELECT doc_id, shard, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY
         |        ((vh - h) % $RingSpace + $RingSpace) % $RingSpace, shard)
         |      AS rn
         |    FROM docs CROSS JOIN vb) WHERE rn = 1)
         |SELECT shard_a, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE shard_a <> shard_b) AS BIGINT)
         |    AS n_moved_ring,
         |  CAST(count(*) FILTER (WHERE h % 8 <> h % 10) AS BIGINT)
         |    AS n_moved_mod,
         |  round(CAST(count(*) FILTER (WHERE shard_a <> shard_b)
         |    AS DOUBLE) / count(*), 6) AS ring_moved_frac
         |FROM da JOIN db USING (doc_id)
         |GROUP BY shard_a ORDER BY shard_a""".stripMargin
    },

    "m11_phash_neardup" ->
      s"""WITH base AS (
         |  SELECT doc_id AS media_id, text FROM documents
         |  WHERE text IS NOT NULL),
         |media AS (
         |  SELECT media_id, text FROM base
         |  UNION ALL
         |  SELECT media_id + 100000, 'X' || substring(text, 2)
         |  FROM base WHERE media_id % 25 = 0),
         |m AS (
         |  SELECT media_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) AS nb
         |  FROM media),
         |h AS (
         |  SELECT media_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(62), i ->
         |        CASE WHEN
         |          CAST(concat('0x', substr(hx,
         |            CAST((i * (nb - 2) // 62) * 2 + 1 AS BIGINT), 2))
         |            AS BIGINT) >
         |          CAST(concat('0x', substr(hx,
         |            CAST(((i * (nb - 2) // 62) + 1) * 2 + 1 AS BIGINT), 2))
         |            AS BIGINT)
         |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |      (a, b) -> a * 2 + b) AS phash
         |  FROM m WHERE nb >= 2),
         |b AS (
         |  SELECT media_id, phash, CAST(r.b AS INTEGER) AS band_id,
         |    (phash >> CAST(r.b * 16 AS INTEGER)) & 65535 AS band_val
         |  FROM h, UNNEST(range(4)) AS r(b)),
         |bb AS (
         |  SELECT band_id, band_val FROM b
         |  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND 100),
         |mem AS (SELECT b.* FROM b JOIN bb USING (band_id, band_val)),
         |cand AS (
         |  SELECT DISTINCT m1.media_id AS a_id, m1.phash AS a_ph,
         |    m2.media_id AS b_id, m2.phash AS b_ph
         |  FROM mem m1 JOIN mem m2
         |    ON m1.band_id = m2.band_id AND m1.band_val = m2.band_val
         |    AND m1.media_id < m2.media_id)
         |SELECT a_id, b_id,
         |  CAST(bit_count(xor(a_ph, b_ph)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(a_ph, b_ph)) <= $HamMax
         |ORDER BY a_id, b_id""".stripMargin,
  )
}
