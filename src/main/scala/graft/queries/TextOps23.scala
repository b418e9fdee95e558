package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 46 (multimodal family, SURVEY.md §2.4):
  *
  *  - m15: audio landmark fingerprinting — the constellation-matching
  *    recipe behind audio identification services: per-media window
  *    energies (m7/m10's int16-PCM device, 8-sample windows) peak-pick
  *    into a sparse constellation, nearby peak PAIRS hash into
  *    landmarks (magnitude-digit quantization — integer-exact in both
  *    engines), and a clip matches its source when many of its
  *    landmarks agree on ONE time offset (the offset-consistent vote
  *    that makes the scheme robust). Clips are interior window slices
  *    of deterministic source media, re-peak-picked clip-locally (the
  *    clip has no context outside its own boundary). Everything is
  *    integer arithmetic over md5-free energy sums, so the whole
  *    match replays in DuckDB. Scale shape: landmarks are a per-media
  *    map + a bounded self-join per media; matching is one equi-join
  *    on the landmark key.
  */
object TextOps23 {
  import Tables.t

  private val WinSmp = 8    // samples per energy window
  private val ClipLo = 2L   // clip = source windows [ClipLo, ClipHi)
  private val ClipHi = 12L
  private val MinWin = 14L  // sources must have ≥ this many windows
  private val MaxDt = 6L    // landmark pair span, in windows

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m15_audio_fingerprint" -> ((spark, dir) => {
      val win = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        // Native PCM kernel: per-window energies fold inside the row
        // (one JVM loop over the bytes), so the frame that leaves the
        // scan is WINDOW-granular — the per-sample posexplode+conv
        // formulation generated one row and a hex parse per sample.
        .select(col("doc_id").as("media_id"),
          posexplode(graft.functions.Pcm16WindowEnergies(
            encode(concat(col("text"), lit("\u00ff\u00ff")), "UTF-8"), WinSmp))
            .as(Seq("w0", "e")))
        .select(col("media_id"), col("w0").cast("long").as("w"), col("e"))
        .persist()
      win.count()
      val byM = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("w")
      def peaksOf(wdf: DataFrame): DataFrame = wdf
        .withColumn("pe", lag(col("e"), 1).over(byM))
        .withColumn("ne", lead(col("e"), 1).over(byM))
        .filter(col("pe").isNotNull && col("ne").isNotNull &&
          col("e") > col("pe") && col("e") >= col("ne"))
        .select(col("media_id"), col("w"),
          // magnitude quantization: digit count + two leading digits —
          // ~48k distinct landmark keys (digit count alone gave ~300,
          // measured to collide into misidentification)
          (length(col("e").cast("string")) * 100 +
            substring(col("e").cast("string"), 1, 2).cast("long"))
            .as("q"))
      def landmarksOf(p: DataFrame): DataFrame = {
        val a = p.select(col("media_id").as("ma"), col("w").as("wa"),
          col("q").as("qa"))
        val b = p.select(col("media_id").as("mb"), col("w").as("wb"),
          col("q").as("qb"))
        a.join(b, col("ma") === col("mb") && col("wb") > col("wa") &&
            col("wb") <= col("wa") + MaxDt)
          .select(col("ma").as("media_id"), col("wa").as("w1"),
            ((col("qa") * 10000 + col("qb")) * 10 +
              (col("wb") - col("wa"))).cast("long").as("lkey"))
      }
      val corpusLm = landmarksOf(peaksOf(win))
      // clips: interior window slices of qualifying sources,
      // re-peak-picked clip-locally (w rebased to 0)
      val nWin = win.groupBy(col("media_id").as("nm"))
        .agg(count(lit(1)).as("nw"))
      val clipWin = win
        .join(nWin, col("media_id") === col("nm") && col("nw") >= MinWin)
        .filter(col("media_id") % 50 === 3 &&
          col("w") >= ClipLo && col("w") < ClipHi)
        .select((col("media_id") + 500000L).as("media_id"),
          (col("w") - ClipLo).as("w"), col("e"))
      val clipLm = landmarksOf(peaksOf(clipWin))
        .select((col("media_id") - 500000L).as("src_id"),
          col("media_id").as("clip_id"), col("w1").as("c_w1"),
          col("lkey").as("c_key"))
      // offset-consistent votes, then best media per clip
      val votes = clipLm.join(corpusLm, col("c_key") === col("lkey"))
        .groupBy(col("clip_id"), col("src_id"),
          col("media_id").as("cand_media"),
          (col("w1") - col("c_w1")).as("dt"))
        .agg(count(lit(1)).as("v"))
        .groupBy(col("clip_id"), col("src_id"), col("cand_media"))
        .agg(max(col("v")).as("best_votes"))
      votes.groupBy(col("clip_id"), col("src_id"))
        .agg(max_by(col("cand_media"),
            col("best_votes") * 1000000L - col("cand_media"))
            .as("matched_media"),
          max(col("best_votes")).as("top_votes"))
        .select(col("clip_id"), col("src_id"), col("matched_media"),
          col("top_votes"))
        .orderBy("clip_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m15_audio_fingerprint" ->
      (s"""WITH m AS (
         |  SELECT doc_id AS media_id, hex(encode(text || 'ÿÿ')) AS hx,
         |    octet_length(encode(text || 'ÿÿ')) // 2 AS n_smp
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (
         |  SELECT media_id, n_smp,
         |    list_transform(
         |      list_transform(range(n_smp),
         |        i -> CAST(concat('0x',
         |               substr(hx, CAST(i*4+3 AS BIGINT), 2),
         |               substr(hx, CAST(i*4+1 AS BIGINT), 2)) AS BIGINT)),
         |      v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS smp
         |  FROM m WHERE n_smp > 0),
         |px AS (
         |  SELECT media_id, CAST(r.i AS BIGINT) // $WinSmp AS w,
         |    smp[CAST(r.i + 1 AS INTEGER)] AS v
         |  FROM s, UNNEST(range(n_smp)) AS r(i)),
         |win AS (
         |  SELECT media_id, w, CAST(sum(v * v) AS BIGINT) AS e
         |  FROM px GROUP BY media_id, w),
         |peaks AS (
         |  SELECT media_id, w,
         |    length(CAST(e AS VARCHAR)) * 100
         |      + CAST(substr(CAST(e AS VARCHAR), 1, 2) AS BIGINT) AS q
         |  FROM (
         |    SELECT media_id, w, e,
         |      lag(e) OVER (PARTITION BY media_id ORDER BY w) AS pe,
         |      lead(e) OVER (PARTITION BY media_id ORDER BY w) AS ne
         |    FROM win)
         |  WHERE pe IS NOT NULL AND ne IS NOT NULL
         |    AND e > pe AND e >= ne),
         |corpus_lm AS (
         |  SELECT a.media_id, a.w AS w1,
         |    (a.q * 10000 + b.q) * 10 + (b.w - a.w) AS lkey
         |  FROM peaks a JOIN peaks b ON a.media_id = b.media_id
         |    AND b.w > a.w AND b.w <= a.w + $MaxDt),
         |nwin AS (
         |  SELECT media_id, CAST(count(*) AS BIGINT) AS nw
         |  FROM win GROUP BY 1),
         |clip_win AS (
         |  SELECT win.media_id + 500000 AS media_id,
         |    win.media_id AS src_id, win.w - $ClipLo AS cw, e
         |  FROM win JOIN nwin ON win.media_id = nwin.media_id
         |  WHERE nwin.nw >= $MinWin AND win.media_id % 50 = 3
         |    AND win.w >= $ClipLo AND win.w < $ClipHi),
         |clip_peaks AS (
         |  SELECT media_id, src_id, cw AS w,
         |    length(CAST(e AS VARCHAR)) * 100
         |      + CAST(substr(CAST(e AS VARCHAR), 1, 2) AS BIGINT) AS q
         |  FROM (
         |    SELECT media_id, src_id, cw, e,
         |      lag(e) OVER (PARTITION BY media_id ORDER BY cw) AS pe,
         |      lead(e) OVER (PARTITION BY media_id ORDER BY cw) AS ne
         |    FROM clip_win)
         |  WHERE pe IS NOT NULL AND ne IS NOT NULL
         |    AND e > pe AND e >= ne),
         |clip_lm AS (
         |  SELECT a.src_id, a.media_id AS clip_id, a.w AS c_w1,
         |    (a.q * 10000 + b.q) * 10 + (b.w - a.w) AS c_key
         |  FROM clip_peaks a JOIN clip_peaks b
         |    ON a.media_id = b.media_id
         |    AND b.w > a.w AND b.w <= a.w + $MaxDt),
         |votes AS (
         |  SELECT clip_id, src_id, cand_media, max(v) AS best_votes
         |  FROM (
         |    SELECT c.clip_id, c.src_id, l.media_id AS cand_media,
         |      l.w1 - c.c_w1 AS dt, CAST(count(*) AS BIGINT) AS v
         |    FROM clip_lm c JOIN corpus_lm l ON c.c_key = l.lkey
         |    GROUP BY 1, 2, 3, 4)
         |  GROUP BY 1, 2, 3)
         |SELECT clip_id, src_id,
         |  arg_max(cand_media, best_votes * 1000000 - cand_media)
         |    AS matched_media,
         |  CAST(max(best_votes) AS BIGINT) AS top_votes
         |FROM votes GROUP BY 1, 2 ORDER BY clip_id""".stripMargin),
  )
}
