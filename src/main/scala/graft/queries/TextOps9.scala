package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 6 (SURVEY.md §2.4):
  *
  *  - m8: aspect-bucketed training-batch packing — the multimodal
  *    dataloader step that groups images of similar aspect ratio and
  *    packs each bucket into fixed-capacity batches (so resize padding
  *    stays small and batch tensors stay dense). Batch indices come
  *    from ONE `GlobalPrefixSum` scan ordered by (bucket, media_id) —
  *    a per-bucket `row_number` window would sort each bucket in a
  *    single task (5 buckets → 5 tasks at any corpus size); the prefix
  *    sum keeps every slice parallel, and per-bucket starts are a
  *    bounded groupBy broadcast back.
  *  - t25: per-source boilerplate prefix detection — the min/max trick:
  *    the longest common prefix of ALL documents in a source equals the
  *    LCP of just the lexicographic MIN and MAX document, so two string
  *    aggregates replace any pairwise comparison. The LCP itself is a
  *    row-local prefix-closed filter over a bounded position sequence.
  *    Headers are a deterministic synthetic overlay on even-numbered
  *    sources (the d23/t10 recipe), leaving odd sources as honest
  *    no-boilerplate negatives.
  *  - m9: video scene segmentation — frame-diff cuts over m3's sampled
  *    frames: per-frame diversity scores (m6's metric), a boundary
  *    wherever the score jumps ≥ 4 against the previous frame, and
  *    gaps-and-islands (q54's pattern) turning boundary flags into
  *    scene ids. All windows partition by media_id over ≤8-row frames —
  *    bounded everywhere.
  *  - s11: Rocchio pseudo-relevance feedback — each probe's top-10
  *    first-pass neighbors are centroid-averaged (per-dimension
  *    rounded→DECIMAL sums, order-free), the query re-runs as
  *    0.5·q + 0.5·centroid, and the witness reports how much the
  *    second-pass top-10 moved. The classic query-expansion loop, all
  *    bounded: probes broadcast, top-k via min-k, centroids via a
  *    position-exploded aggregation over probes×k×64 rows.
  *  - m10: audio activity segmentation (VAD-like) — m7's int16-LE PCM
  *    decode cut into 64-sample windows; a window is "active" when its
  *    integer-exact energy exceeds the medium's own mean window energy
  *    (adaptive threshold), and consecutive active windows collapse to
  *    segments via the islands pass. The sample explode is map-side
  *    combinable into per-window energies; every window function runs
  *    over ≤~40-row media partitions.
  */
object TextOps9 {
  import Tables.t

  private val BatchCap = 32
  private val LcpMax = 200

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_aspect_batches" -> ((spark, dir) => {
      val dec = graft.mm.Multimodal.decodeAll(
        graft.mm.Multimodal.mediaFromDocuments(t(spark, dir, "documents")))
        .toDF()
        .select(col("media_id"), col("width"), col("height"))
      val ratio = col("width").cast("double") / col("height")
      val bucketed = dec.withColumn("bucket",
        when(ratio < 0.75, "tall")
          .when(ratio < 0.9, "portrait")
          .when(ratio <= 1.1, "square")
          .when(ratio <= 1.4, "landscape")
          .otherwise("wide"))
        .withColumn("one", lit(1L))
      // one distributed scan gives a global index in (bucket, media_id)
      // order; per-bucket starts are a 5-row groupBy broadcast back
      val idx = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        bucketed, struct(col("bucket"), col("media_id")), "one", "gidx")
      val starts = idx.groupBy("bucket").agg(min("gidx").as("bstart"))
      idx.join(broadcast(starts), Seq("bucket"))
        .withColumn("batch_id", expr(s"(gidx - bstart) div $BatchCap"))
        .groupBy("bucket", "batch_id")
        .agg(count(lit(1)).as("n_items"),
          min("media_id").as("first_media"), max("media_id").as("last_media"))
        .orderBy("bucket", "batch_id")
    }),

    "t25_boilerplate_prefix" -> ((spark, dir) => {
      // deterministic syndication-header overlay on even-numbered sources
      val headed = t(spark, dir, "documents").filter(col("text").isNotNull)
        .withColumn("src_no",
          regexp_replace(col("source"), "^src", "").cast("int"))
        .withColumn("doc",
          when(col("src_no") % 2 === 0,
            concat(lit("["), col("source"), lit(" syndicated feed] "),
              col("text")))
            .otherwise(col("text")))
      val agg0 = headed.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc")).as("mn"), max(col("doc")).as("mx"))
      // LCP(all docs) = LCP(lexicographic min, max); prefix-equality is
      // prefix-closed, so the matching-position count IS the LCP length
      agg0.withColumn("lcp_len",
          size(expr(s"filter(sequence(1, $LcpMax), " +
            "p -> substring(mn, 1, p) = substring(mx, 1, p))"))
            .cast("long"))
        .select(col("source"), col("n_docs"), col("lcp_len"),
          expr("substring(mn, 1, cast(lcp_len as int))").as("boilerplate"),
          (col("lcp_len") >= 10).as("has_boilerplate"))
        .orderBy("source")
    }),

    "m9_scene_cuts" -> ((spark, dir) => {
      val media = graft.mm.Multimodal
        .mediaFromDocuments(t(spark, dir, "documents")).toDF()
      val scored = graft.mm.Multimodal.sampleFrames(media, 8)
        .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
          size(array_distinct(
            regexp_extract_all(hex(col("frame_bytes")), lit(".."), lit(0))))
            .as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      val wRun = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      scored
        .withColumn("prev", lag(col("score"), 1).over(w))
        .withColumn("boundary",
          when(col("prev").isNotNull &&
            abs(col("score") - col("prev")) >= 4, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("scene_id", sum(col("boundary")).over(wRun))
        .groupBy("media_id", "scene_id")
        .agg(count(lit(1)).as("n_frames"),
          min("frame_idx").as("first_frame"),
          max("frame_idx").as("last_frame"),
          max("score").as("peak_score"))
        .orderBy("media_id", "scene_id")
    }),

    "s11_rocchio" -> ((spark, dir) => {
      val K = 10
      val e = t(spark, dir, "embeddings").filter(col("embedding").isNotNull)
        .select(col("vec_id"),
          graft.functions.VectorOps.toDouble(col("embedding")).as("emb"))
      val probes = e.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("p_id"), col("emb").as("p_emb"))
      val corpus = e.select(col("vec_id").as("n_id"), col("emb").as("n_emb"))
      def topk(pFrame: DataFrame, embCol: String) = corpus
        .crossJoin(broadcast(pFrame))
        .filter(col("n_id") =!= col("p_id"))
        .select(col("p_id"), col("n_id"),
          round(graft.functions.GraftFunctions.cosineSim(
            col(embCol), col("n_emb")), 6).as("cos"))
        .groupBy("p_id")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("cos")).as("neg"), col("n_id").as("id")), K).as("top"))
        .select(col("p_id"), explode(col("top")).as("m"))
        .select(col("p_id"), col("m.id").as("n_id"))
      val first = topk(probes, "p_emb")
      // centroid of the first-pass neighbors: per-dimension order-free
      // DECIMAL sums over the position-exploded (probe × k × dim) frame
      val cent = first.join(corpus, Seq("n_id"))
        .select(col("p_id"), posexplode(col("n_emb")))
        .groupBy(col("p_id"), col("pos"))
        .agg(sum(round(col("col"), 8).cast("decimal(20,8)")).as("s"))
        .groupBy("p_id")
        .agg(sort_array(collect_list(struct(col("pos"),
          (col("s").cast("double") / lit(K.toDouble)).as("v")))).as("pairs"))
        .select(col("p_id"), expr("transform(pairs, x -> x.v)").as("c_emb"))
      // expanded query: 0.5·q + 0.5·centroid, element-wise
      val expanded = probes.join(cent, Seq("p_id"))
        .select(col("p_id"), expr(
          "zip_with(p_emb, c_emb, (a, b) -> 0.5 * a + 0.5 * b)").as("x_emb"))
      val second = topk(expanded, "x_emb")
        .select(col("p_id").as("p_id2"), col("n_id").as("n_id2"))
      first.join(second, col("p_id") === col("p_id2") &&
          col("n_id") === col("n_id2"), "inner")
        .groupBy("p_id")
        .agg(count(lit(1)).as("n_kept"))
        .join(probes.select(col("p_id")), Seq("p_id"), "right")
        .select(col("p_id").as("vec_id"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (lit(K.toLong) - coalesce(col("n_kept"), lit(0L))).as("n_new"))
        .orderBy("vec_id")
    }),

    "m10_vad_segments" -> ((spark, dir) => {
      // m7's in-row PCM decode, then per-64-sample window energies
      val win = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        // Native PCM kernel: per-window energies fold inside the row
        // (one JVM loop over the bytes), so the frame that leaves the
        // scan is WINDOW-granular — the per-sample posexplode+conv
        // formulation generated one row and a hex parse per sample.
        .select(col("doc_id").as("media_id"),
          posexplode(graft.functions.Pcm16WindowEnergies(
            encode(concat(col("text"), lit("\u00ff\u00ff")), "UTF-8"), 64))
            .as(Seq("w0", "e")))
        .select(col("media_id"), col("w0").cast("long").as("w"), col("e"))
        .persist()
      win.count()
      val thresh = win.groupBy("media_id")
        .agg(sum("e").as("se"), count(lit(1)).as("nw"))
        .select(col("media_id"),
          (col("se").cast("double") / col("nw").cast("double")).as("thr"))
      val byMedia = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("w")
      val run = byMedia.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val flagged = win.join(thresh, "media_id")
        .withColumn("active", col("e").cast("double") > col("thr"))
        .withColumn("prev", lag(col("active"), 1).over(byMedia))
        .withColumn("starts",
          when(col("active") &&
            (col("prev").isNull || !col("prev")), lit(1L)).otherwise(lit(0L)))
        .withColumn("run_id", sum(col("starts")).over(run))
      val segLens = flagged.filter(col("active"))
        .groupBy("media_id", "run_id")
        .agg(count(lit(1)).as("seg_len"))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_segments"), max("seg_len").as("longest"))
      flagged.groupBy("media_id")
        .agg(count(lit(1)).as("n_windows"),
          count_if(col("active")).as("n_active"))
        .join(segLens, Seq("media_id"), "left")
        .select(col("media_id"), col("n_windows"), col("n_active"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("longest"), lit(0L)).as("longest_segment"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m8_aspect_batches" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    octet_length(encode(text)) % 640 + 1 AS width,
         |    octet_length(encode(text)) % 480 + 1 AS height
         |  FROM documents WHERE text IS NOT NULL),
         |b AS (
         |  SELECT media_id,
         |    CASE WHEN CAST(width AS DOUBLE) / height < 0.75 THEN 'tall'
         |         WHEN CAST(width AS DOUBLE) / height < 0.9 THEN 'portrait'
         |         WHEN CAST(width AS DOUBLE) / height <= 1.1 THEN 'square'
         |         WHEN CAST(width AS DOUBLE) / height <= 1.4 THEN 'landscape'
         |         ELSE 'wide' END AS bucket
         |  FROM m),
         |i AS (
         |  SELECT media_id, bucket,
         |    row_number() OVER (PARTITION BY bucket ORDER BY media_id) - 1
         |      AS li
         |  FROM b)
         |SELECT bucket, CAST(li // $BatchCap AS BIGINT) AS batch_id,
         |  CAST(count(*) AS BIGINT) AS n_items,
         |  min(media_id) AS first_media, max(media_id) AS last_media
         |FROM i GROUP BY bucket, li // $BatchCap
         |ORDER BY bucket, batch_id""".stripMargin,

    "t25_boilerplate_prefix" ->
      s"""WITH h AS (
         |  SELECT source,
         |    CASE WHEN CAST(regexp_replace(source, '^src', '') AS INTEGER)
         |           % 2 = 0
         |      THEN '[' || source || ' syndicated feed] ' || text
         |      ELSE text END AS doc
         |  FROM documents WHERE text IS NOT NULL),
         |a AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    min(doc) AS mn, max(doc) AS mx
         |  FROM h GROUP BY source),
         |l AS (
         |  SELECT source, n_docs, mn,
         |    CAST(len(list_filter(range(1, ${LcpMax + 1}),
         |      p -> substring(mn, 1, p) = substring(mx, 1, p))) AS BIGINT)
         |      AS lcp_len
         |  FROM a)
         |SELECT source, n_docs, lcp_len,
         |  substring(mn, 1, CAST(lcp_len AS INTEGER)) AS boilerplate,
         |  lcp_len >= 10 AS has_boilerplate
         |FROM l ORDER BY source""".stripMargin,

    // Frame replay as in m3/m6 (hex-string slicing stands in for BLOB
    // slicing), then lag-diff boundaries and a running-sum islands pass.
    "m9_scene_cuts" ->
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
        |SELECT media_id, scene_id, CAST(count(*) AS BIGINT) AS n_frames,
        |  min(frame_idx) AS first_frame, max(frame_idx) AS last_frame,
        |  max(score) AS peak_score
        |FROM sc GROUP BY media_id, scene_id
        |ORDER BY media_id, scene_id""".stripMargin,

    "s11_rocchio" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |p AS (SELECT vec_id AS p_id, emb AS p_emb FROM e
        |      WHERE vec_id % 50 = 0),
        |s1 AS (
        |  SELECT p_id, e.vec_id AS n_id,
        |    round(list_dot_product(p_emb, e.emb) /
        |      (sqrt(list_dot_product(p_emb, p_emb))
        |        * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM e CROSS JOIN p WHERE e.vec_id <> p_id),
        |f1 AS (
        |  SELECT p_id, n_id FROM (
        |    SELECT p_id, n_id, row_number() OVER (PARTITION BY p_id
        |      ORDER BY cos DESC, n_id) AS rn FROM s1)
        |  WHERE rn <= 10),
        |cent AS (
        |  SELECT p_id, list(v ORDER BY pos) AS c_emb FROM (
        |    SELECT f1.p_id, r.pos,
        |      CAST(sum(CAST(round(e.emb[CAST(r.pos AS INTEGER)], 8)
        |        AS DECIMAL(20,8))) AS DOUBLE) / 10.0 AS v
        |    FROM f1 JOIN e ON f1.n_id = e.vec_id,
        |      UNNEST(range(1, 65)) AS r(pos)
        |    GROUP BY f1.p_id, r.pos)
        |  GROUP BY p_id),
        |x AS (
        |  SELECT p.p_id,
        |    list_transform(range(1, 65), i ->
        |      0.5 * p_emb[CAST(i AS INTEGER)]
        |      + 0.5 * c_emb[CAST(i AS INTEGER)]) AS x_emb
        |  FROM p JOIN cent ON p.p_id = cent.p_id),
        |s2 AS (
        |  SELECT x.p_id, e.vec_id AS n_id,
        |    round(list_dot_product(x_emb, e.emb) /
        |      (sqrt(list_dot_product(x_emb, x_emb))
        |        * sqrt(list_dot_product(e.emb, e.emb))), 6) AS cos
        |  FROM e CROSS JOIN x WHERE e.vec_id <> x.p_id),
        |f2 AS (
        |  SELECT p_id, n_id FROM (
        |    SELECT p_id, n_id, row_number() OVER (PARTITION BY p_id
        |      ORDER BY cos DESC, n_id) AS rn FROM s2)
        |  WHERE rn <= 10),
        |kept AS (
        |  SELECT p_id, CAST(count(*) AS BIGINT) AS n_kept
        |  FROM f1 JOIN f2 USING (p_id, n_id) GROUP BY p_id)
        |SELECT p.p_id AS vec_id, coalesce(n_kept, 0) AS n_kept,
        |  10 - coalesce(n_kept, 0) AS n_new
        |FROM p LEFT JOIN kept ON p.p_id = kept.p_id
        |ORDER BY vec_id""".stripMargin,

    // m7's PCM replay, then window energies + adaptive threshold +
    // islands — the audio twin of m9's scene cuts.
    "m10_vad_segments" ->
      ("WITH m AS (\n" +
      "  SELECT doc_id AS media_id, hex(encode(text || 'ÿÿ')) AS hx,\n" +
      "    octet_length(encode(text || 'ÿÿ')) // 2 AS n_smp\n" +
      "  FROM documents WHERE text IS NOT NULL),\n" +
      "s AS (\n" +
      "  SELECT media_id, n_smp,\n" +
      "    list_transform(\n" +
      "      list_transform(range(n_smp),\n" +
      "        i -> CAST(concat('0x',\n" +
      "               substr(hx, CAST(i*4+3 AS BIGINT), 2),\n" +
      "               substr(hx, CAST(i*4+1 AS BIGINT), 2)) AS BIGINT)),\n" +
      "      v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS smp\n" +
      "  FROM m WHERE n_smp > 0),\n" +
      "px AS (\n" +
      "  SELECT media_id, CAST(r.i AS BIGINT) // 64 AS w,\n" +
      "    smp[CAST(r.i + 1 AS INTEGER)] AS v\n" +
      "  FROM s, UNNEST(range(n_smp)) AS r(i)),\n" +
      "win AS (\n" +
      "  SELECT media_id, w, CAST(sum(v * v) AS BIGINT) AS e\n" +
      "  FROM px GROUP BY media_id, w),\n" +
      "thr AS (\n" +
      "  SELECT media_id,\n" +
      "    CAST(sum(e) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS thr\n" +
      "  FROM win GROUP BY media_id),\n" +
      "fl AS (\n" +
      "  SELECT win.media_id, w, e,\n" +
      "    CAST(e AS DOUBLE) > thr AS active\n" +
      "  FROM win JOIN thr ON win.media_id = thr.media_id),\n" +
      "st AS (\n" +
      "  SELECT media_id, w, active,\n" +
      "    CASE WHEN active AND coalesce(NOT lag(active) OVER (\n" +
      "      PARTITION BY media_id ORDER BY w), true)\n" +
      "      THEN 1 ELSE 0 END AS starts\n" +
      "  FROM fl),\n" +
      "rid AS (\n" +
      "  SELECT media_id, w, active,\n" +
      "    CAST(sum(starts) OVER (PARTITION BY media_id ORDER BY w\n" +
      "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)\n" +
      "      AS run_id\n" +
      "  FROM st),\n" +
      "seg AS (\n" +
      "  SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,\n" +
      "    CAST(max(seg_len) AS BIGINT) AS longest FROM (\n" +
      "    SELECT media_id, run_id, count(*) AS seg_len\n" +
      "    FROM rid WHERE active GROUP BY media_id, run_id)\n" +
      "  GROUP BY media_id)\n" +
      "SELECT rid.media_id, CAST(count(*) AS BIGINT) AS n_windows,\n" +
      "  CAST(count(*) FILTER (WHERE active) AS BIGINT) AS n_active,\n" +
      "  coalesce(max(n_segments), 0) AS n_segments,\n" +
      "  coalesce(max(longest), 0) AS longest_segment\n" +
      "FROM rid LEFT JOIN seg ON rid.media_id = seg.media_id\n" +
      "GROUP BY rid.media_id ORDER BY rid.media_id"),
  )
}
