package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 additions, batch 139 (SURVEY.md §2.4):
  *
  *  - q349: auditable Bloom semi-join — the small-side filter an
  *    engine ships across the cluster INSTEAD of shuffling the fact
  *    table: the build side (one nation's customers) hashes k=3
  *    md5-positions into a 16384-bit bitmap held as 265 62-bit
  *    bit_or-merged words (the d17 device; 62 bits keeps every shift
  *    inside both engines' checked Long range). The ~2 KB bitmap is
  *    collected once and inlined as a LITERAL array (the
  *    AnnLsh.bucketize plane-literal device), so the probe is one
  *    row-local `forall` over the 3 hash positions — a pure map-side
  *    filter on the fact scan, no explode, no fact-grain exchange.
  *    (The round-6 formulation exploded orders ×3 and re-grouped at
  *    fact grain to count set bits — the exact shuffle a bloom
  *    semi-join exists to avoid; PlanShapeSpec now pins the map-only
  *    shape.) The audit measures the realized false-positive rate
  *    against the exact semi-join — the number an engineer needs
  *    before trusting a bloom pushdown at 100 TB. Nothing shuffles
  *    but the build-side word merge and three scalar aggregations.
  *  - m26: voice-activity segmentation — the audio-curation pass that
  *    cuts silence: 40 md5-derived frame energies per media, voiced =
  *    energy above the fixed threshold, segments = islands of
  *    consecutive voiced frames (per-media windows only). Reports
  *    per-media voiced fraction, segment count, and the longest take.
  */
object Analytics139 {
  import Tables.t

  private val BloomBits = 16384L
  private val Hashes = 3
  private val Frames = 40
  private val Threshold = 128L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q349_bloom_semijoin" -> ((spark, dir) => {
      val build = t(spark, dir, "customer")
        .filter(col("c_nationkey") === 7)
        .select(col("c_custkey"))
        .localCheckpoint(true) // bloom build AND the exact control
      def positions(key: org.apache.spark.sql.Column) = array(
        (1 to Hashes).map(j =>
          graft.functions.Md5Pack(concat(lit(s"bl${j}_"),
            key.cast("string"))) % BloomBits): _*)
      // Build: word -> bit_or of masks, over the (tiny) dimension side
      // only; then collect the 265 words to the driver and inline them
      // as a literal Long array. At 100 TB the build side is still one
      // nation's customer keys — the collect is bounded by the bitmap
      // size (2 KB), never by the data.
      val words = build
        .select(explode(positions(col("c_custkey"))).as("p"))
        .select(expr("p div 62").as("word"),
          expr("shiftleft(1L, CAST(p % 62 AS INT))").as("mask"))
        .groupBy("word").agg(bit_or(col("mask")).as("bits"))
        .collect()
      val bitmap = new Array[Long]((BloomBits / 62 + 1).toInt)
      words.foreach(r => bitmap(r.getLong(0).toInt) = r.getLong(1))
      val probes = t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      // Probe: row-local forall over the 3 positions against the literal
      // bitmap — a plain Filter on the fact scan, zero probe-side
      // exchanges (all-bits-set === the round-6 count==3 semantics,
      // duplicate positions included).
      val passed = probes
        .withColumn("ps", positions(col("o_custkey")))
        .withColumn("bm", typedLit(bitmap.toSeq))
        .filter(expr("forall(ps, p -> (element_at(bm, " +
          "CAST(p div 62 AS INT) + 1) & " +
          "shiftleft(1L, CAST(p % 62 AS INT))) <> 0)"))
      val actual = probes.join(broadcast(build),
        col("o_custkey") === col("c_custkey"), "left_semi")
      val nProbe = probes.agg(count(lit(1)).as("n_probe"))
      val nPass = passed.agg(count(lit(1)).as("n_candidates"))
      val nTrue = actual.agg(count(lit(1)).as("n_actual"))
      nProbe.crossJoin(nPass).crossJoin(nTrue)
        .select(col("n_probe"), col("n_candidates"), col("n_actual"),
          (col("n_candidates") - col("n_actual")).as("n_false_pos"),
          ((col("n_candidates") - col("n_actual")).cast("double")
            / (col("n_probe") - col("n_actual")).cast("double"))
            .as("measured_fpr"))
    }),

    "m26_vad_segments" -> ((spark, dir) => {
      val media = graft.mm.Multimodal
        .mediaFromDocuments(t(spark, dir, "documents")).toDF()
        .filter(col("n_bytes") >= Frames)
      val frames = graft.mm.Multimodal.sampleFrames(media, Frames)
        .select(col("media_id"), col("frame_idx"),
          (expr("CAST(conv(substr(md5(hex(frame_bytes)), 1, 2), 16, 10)" +
            " AS BIGINT)") > Threshold).as("voiced"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      val seg = frames
        .withColumn("turn_on",
          when(col("voiced") &&
            !coalesce(lag(col("voiced"), 1).over(w), lit(false)), 1L)
            .otherwise(0L))
        .withColumn("seg_id",
          sum(col("turn_on")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      val perSeg = seg.filter(col("voiced"))
        .groupBy("media_id", "seg_id")
        .agg(count(lit(1)).as("seg_len"))
      val perMedia = seg.groupBy("media_id")
        .agg(count_if(col("voiced")).as("voiced_frames"))
      perMedia
        .join(perSeg.groupBy("media_id")
          .agg(count(lit(1)).as("n_segments"),
            max(col("seg_len")).as("longest_segment")),
          Seq("media_id"), "left")
        .select(col("media_id"), col("voiced_frames"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("longest_segment"), lit(0L)).as("longest_segment"),
          (col("voiced_frames").cast("double") / Frames.toDouble)
            .as("voiced_fraction"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q349_bloom_semijoin" -> {
      def h(j: Int, e: String) =
        Tables.duckMd5Pack(s"concat('bl${j}_', CAST($e AS VARCHAR))")
      val buildPos = (1 to Hashes)
        .map(j => s"SELECT ${h(j, "c_custkey")} % $BloomBits AS p FROM build")
        .mkString(" UNION ALL ")
      val probePos = (1 to Hashes)
        .map(j => s"""SELECT o_orderkey, o_custkey,
                     |  ${h(j, "o_custkey")} % $BloomBits AS p
                     |  FROM probes""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH build AS MATERIALIZED (
         |  SELECT c_custkey FROM customer WHERE c_nationkey = 7),
         |bpos AS ($buildPos),
         |bloom AS MATERIALIZED (
         |  SELECT p // 62 AS word,
         |    CAST(bit_or(1::BIGINT << CAST(p % 62 AS INTEGER)) AS BIGINT)
         |      AS bits
         |  FROM bpos GROUP BY 1),
         |probes AS (SELECT o_orderkey, o_custkey FROM orders),
         |ppos AS ($probePos),
         |hits AS (
         |  SELECT o_orderkey, o_custkey,
         |    count(*) FILTER ((coalesce(bits, 0)
         |      & (1::BIGINT << CAST(p % 62 AS INTEGER))) <> 0) AS hits
         |  FROM ppos LEFT JOIN bloom ON p // 62 = bloom.word
         |  GROUP BY 1, 2),
         |passed AS (SELECT * FROM hits WHERE hits = $Hashes),
         |act AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_actual FROM probes
         |  WHERE o_custkey IN (SELECT c_custkey FROM build)),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probe FROM probes),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM passed)
         |SELECT n_probe, n_candidates, n_actual,
         |  CAST(n_candidates - n_actual AS BIGINT) AS n_false_pos,
         |  CAST(n_candidates - n_actual AS DOUBLE)
         |    / CAST(n_probe - n_actual AS DOUBLE) AS measured_fpr
         |FROM np CROSS JOIN nc CROSS JOIN act""".stripMargin
    },

    "m26_vad_segments" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
         |    hex(encode(text)) AS hx
         |  FROM documents WHERE text IS NOT NULL
         |    AND octet_length(encode(text)) >= $Frames),
         |f AS (
         |  SELECT media_id, n_bytes, hx,
         |    CAST(floor(n_bytes / $Frames) AS INTEGER) AS flen,
         |    unnest(range($Frames)) AS fi
         |  FROM m),
         |frames AS (
         |  SELECT media_id, fi,
         |    CAST(concat('0x', substr(md5(substr(hx,
         |      CAST(fi * flen * 2 + 1 AS BIGINT),
         |      CAST(2 * (CASE WHEN fi = ${Frames - 1}
         |        THEN n_bytes - flen * ${Frames - 1}
         |        ELSE flen END) AS BIGINT))), 1, 2)) AS BIGINT)
         |      > $Threshold AS voiced
         |  FROM f),
         |turns AS (
         |  SELECT media_id, fi, voiced,
         |    CASE WHEN voiced AND NOT coalesce(lag(voiced) OVER (
         |        PARTITION BY media_id ORDER BY fi), FALSE)
         |      THEN 1 ELSE 0 END AS turn_on
         |  FROM frames),
         |seg AS (
         |  SELECT media_id, fi, voiced,
         |    sum(turn_on) OVER (PARTITION BY media_id ORDER BY fi
         |      ROWS UNBOUNDED PRECEDING) AS seg_id
         |  FROM turns),
         |per_seg AS (
         |  SELECT media_id, seg_id, CAST(count(*) AS BIGINT) AS seg_len
         |  FROM seg WHERE voiced GROUP BY 1, 2),
         |per_media AS (
         |  SELECT media_id,
         |    CAST(count(*) FILTER (voiced) AS BIGINT) AS voiced_frames
         |  FROM seg GROUP BY 1),
         |seg_stats AS (
         |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,
         |    CAST(max(seg_len) AS BIGINT) AS longest_segment
         |  FROM per_seg GROUP BY 1)
         |SELECT pm.media_id, voiced_frames,
         |  coalesce(n_segments, 0) AS n_segments,
         |  coalesce(longest_segment, 0) AS longest_segment,
         |  CAST(voiced_frames AS DOUBLE) / ${Frames}.0 AS voiced_fraction
         |FROM per_media pm LEFT JOIN seg_stats s
         |  ON pm.media_id = s.media_id
         |ORDER BY pm.media_id""".stripMargin,
  )
}
