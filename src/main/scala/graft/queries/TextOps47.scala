package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 90 multimodal ops (SURVEY.md §2.4):
  *
  *  - m22: SMPTE drop-frame timecode — the 29.97 fps NTSC mapping
  *    from a frame COUNT to the wall-clock HH:MM:SS;FF label: two
  *    frame numbers are skipped every minute except minutes divisible
  *    by 10 (18 per ten-minute block of 17982 frames). Pure integer
  *    arithmetic replayed identically by the oracle, formatted with
  *    lpad — the broadcast-video bookkeeping a media pipeline gets
  *    wrong at its peril. Frame counts come from the PCM sample
  *    counts (one "frame" per 16 samples, the deterministic stand-in).
  */
object TextOps47 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m22_dropframe_timecode" -> ((spark, dir) => {
      val frames = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          ((octet_length(encode(concat(col("text"), lit("ÿÿ")), "UTF-8"))
            / 2).cast("long") * 100 / 16).cast("long").as("fc"))
      frames
        .withColumn("d10", expr("fc div 17982"))
        .withColumn("rem", col("fc") % 17982)
        .withColumn("adj", expr(
          "fc + 18 * d10 + CASE WHEN rem > 1 THEN 2 * ((rem - 2) div 1798) ELSE 0 END"))
        .select(col("media_id"), col("fc"),
          concat(
            lpad(expr("adj div 107892").cast("string"), 2, "0"), lit(":"),
            lpad(expr("(adj div 1800) % 60").cast("string"), 2, "0"),
            lit(":"),
            lpad(expr("(adj div 30) % 60").cast("string"), 2, "0"),
            lit(";"),
            lpad((col("adj") % 30).cast("string"), 2, "0")).as("timecode"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m22_dropframe_timecode" ->
      ("WITH f AS (\n" +
      "  SELECT doc_id AS media_id,\n" +
      "    (octet_length(encode(text || 'ÿÿ')) // 2) * 100 // 16 AS fc\n" +
      "  FROM documents WHERE text IS NOT NULL)\n" +
      ", a AS (\n" +
      "  SELECT media_id, fc, fc // 17982 AS d10, fc % 17982 AS rem\n" +
      "  FROM f)\n" +
      ", b AS (\n" +
      "  SELECT media_id, fc,\n" +
      "    fc + 18 * d10 + CASE WHEN rem > 1\n" +
      "      THEN 2 * ((rem - 2) // 1798) ELSE 0 END AS adj\n" +
      "  FROM a)\n" +
      "SELECT media_id, CAST(fc AS BIGINT) AS fc,\n" +
      "  concat(\n" +
      "    lpad(CAST(adj // 107892 AS VARCHAR), 2, '0'), ':',\n" +
      "    lpad(CAST((adj // 1800) % 60 AS VARCHAR), 2, '0'), ':',\n" +
      "    lpad(CAST((adj // 30) % 60 AS VARCHAR), 2, '0'), ';',\n" +
      "    lpad(CAST(adj % 30 AS VARCHAR), 2, '0')) AS timecode\n" +
      "FROM b ORDER BY media_id"),
  )
}
