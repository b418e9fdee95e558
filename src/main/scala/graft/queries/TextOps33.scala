package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 64 text/multimodal ops (SURVEY.md §2.4):
  *
  *  - t37: shingle novelty — per document, the fraction of its
  *    distinct 3-word shingles that occur NOWHERE else in the corpus
  *    (document frequency 1). The dedup-adjacent "how much of this doc
  *    is original text" signal that drives boilerplate down-weighting
  *    in pretraining mixes. Shape: shingle explode → df groupBy →
  *    join back → per-doc ratio; every stage map-side combinable,
  *    linear in corpus size (same discipline as d3/t4).
  *  - m18: waveform envelope — the audio-thumbnail op: each clip's
  *    PCM stream (the m7 deterministic 16-bit LE decode) reduced to 8
  *    equal-width buckets of (peak, energy). Pure integer arithmetic
  *    end-to-end, expression-only per row (slice + aggregate inside
  *    the codegen'd projection), no shuffle beyond the presentation
  *    sort; clips shorter than 8 samples are excluded so every bucket
  *    is nonempty by construction.
  */
object TextOps33 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t37_shingle_novelty" -> ((spark, dir) => {
      val sh = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("sh"))
      val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      sh.join(df, "sh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count_if(col("df") === 1).as("n_unique"))
        .withColumn("novelty",
          round(col("n_unique").cast("double")
            / col("n_shingles").cast("double"), 6))
        .orderBy("doc_id")
    }),

    "m18_waveform_envelope" -> ((spark, dir) => {
      val pcm = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          hex(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")).as("hx"),
          (octet_length(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")) / 2)
            .cast("long").as("n_smp"))
        .filter(col("n_smp") >= 8)
        .withColumn("smp", expr(
          """transform(
            |  transform(sequence(0L, n_smp - 1),
            |    i -> CAST(conv(concat(
            |           substring(hx, CAST(i*4+3 AS INT), 2),
            |           substring(hx, CAST(i*4+1 AS INT), 2)), 16, 10)
            |         AS BIGINT)),
            |  v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)"""
            .stripMargin))
      pcm
        .select(col("media_id"), col("n_smp"),
          explode(sequence(lit(0L), lit(7L))).as("bucket"), col("smp"))
        .withColumn("lo", expr("n_smp * bucket div 8"))
        .withColumn("len", expr("n_smp * (bucket + 1) div 8 - lo"))
        .select(col("media_id"), col("n_smp"), col("bucket"),
          expr("aggregate(slice(smp, CAST(lo + 1 AS INT), CAST(len AS INT)), " +
            "0L, (a, v) -> greatest(a, abs(v)))").as("peak"),
          expr("aggregate(slice(smp, CAST(lo + 1 AS INT), CAST(len AS INT)), " +
            "0L, (a, v) -> a + v * v)").as("energy_sq"))
        .orderBy("media_id", "bucket")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "t37_shingle_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(len(tk)-2),
        |    i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))) AS sh
        |  FROM d),
        |df AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(count(*) FILTER (df.df = 1) AS BIGINT) AS n_unique,
        |  round(CAST(count(*) FILTER (df.df = 1) AS DOUBLE) / count(*), 6)
        |    AS novelty
        |FROM sh JOIN df USING (sh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "m18_waveform_envelope" ->
      ("WITH m AS (\n" +
      "  SELECT doc_id AS media_id, hex(encode(text || 'ÿÿ')) AS hx,\n" +
      "    octet_length(encode(text || 'ÿÿ')) // 2 AS n_smp\n" +
      "  FROM documents WHERE text IS NOT NULL)\n" +
      ", s AS (\n" +
      "  SELECT media_id, n_smp,\n" +
      "    list_transform(\n" +
      "      list_transform(range(n_smp),\n" +
      "        i -> CAST(concat('0x',\n" +
      "               substr(hx, CAST(i*4+3 AS BIGINT), 2),\n" +
      "               substr(hx, CAST(i*4+1 AS BIGINT), 2)) AS BIGINT)),\n" +
      "      v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS smp\n" +
      "  FROM m WHERE n_smp >= 8)\n" +
      ", b AS (\n" +
      "  SELECT media_id, n_smp, smp, unnest(range(8)) AS bucket FROM s)\n" +
      ", sl AS (\n" +
      "  SELECT media_id, n_smp, bucket,\n" +
      "    list_slice(smp, n_smp * bucket // 8 + 1,\n" +
      "      n_smp * (bucket + 1) // 8) AS seg\n" +
      "  FROM b)\n" +
      "SELECT media_id, CAST(n_smp AS BIGINT) AS n_smp,\n" +
      "  CAST(bucket AS BIGINT) AS bucket,\n" +
      "  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),\n" +
      "    list_transform(seg, v -> abs(v))), (a, x) -> greatest(a, x))\n" +
      "    AS BIGINT) AS peak,\n" +
      "  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),\n" +
      "    list_transform(seg, v -> v * v)), (a, x) -> a + x)\n" +
      "    AS BIGINT) AS energy_sq\n" +
      "FROM sl ORDER BY media_id, bucket"),
  )
}
