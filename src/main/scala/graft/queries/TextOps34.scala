package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 65 dedup/multimodal ops (SURVEY.md §2.4):
  *
  *  - d39: over-cap cluster exemption — the production-dedup pathology
  *    guard: a near-dup cluster whose size blows past a cap is almost
  *    never true duplication; it is boilerplate (license headers,
  *    templates) that deserves a different treatment than keep-one.
  *    The d8 clusters get sized, over-cap clusters are EXEMPTED (all
  *    members kept, routed to the boilerplate pipeline), under-cap
  *    clusters keep only their canonical min-id member. One groupBy
  *    over the cluster labels + a broadcast-size join back.
  *  - m19: loudness-normalization gain audit — per clip: RMS level
  *    from the exact integer energy (m7 decode), the gain that would
  *    bring it to the −20 dBFS-ish target (3276.8 RMS), and the count
  *    of samples that would CLIP at that gain — the would-this-distort
  *    check a real normalizer runs before rewriting audio. The
  *    per-sample clip test replays inside one aggregate expression:
  *    map-only, integer/double per row, deterministic (gain is pinned
  *    to 6dp before the comparison).
  */
object TextOps34 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d39_cluster_size_cap" -> ((spark, dir) => {
      val Cap = 5
      val labels = TextOps.queries("d8_dedup_clusters")(spark, dir)
        .select(col("doc_id"), col("cluster_keeper"))
      val sizes = labels.groupBy("cluster_keeper")
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "cluster_keeper")
        .select(col("doc_id"), col("cluster_keeper"), col("cluster_size"),
          (col("cluster_size") > Cap).as("boilerplate"),
          (col("cluster_size") > Cap
            || col("doc_id") === col("cluster_keeper")).as("keep"))
        .orderBy("doc_id")
    }),

    "m19_loudness_gain" -> ((spark, dir) => {
      // Native PCM loudness kernel: decode, Σv², the rounded rms/gain,
      // and the clip count all fold inside the row — the hex+conv
      // per-sample lambda formulation paid a string slice and a radix
      // parse per sample (bit-equality pinned in Round9vSpec).
      t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          graft.functions.Pcm16Loudness(
            encode(concat(col("text"), lit("\u00ff\u00ff")), "UTF-8"))
            .as("st"))
        .filter(col("st")("n_smp") > 0 && col("st")("energy_sq") > 0)
        .select(col("media_id"),
          col("st")("n_smp").as("n_smp"),
          col("st")("rms").as("rms"),
          col("st")("gain").as("gain"),
          col("st")("n_would_clip").as("n_would_clip"),
          (col("st")("n_would_clip") === 0).as("safe"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d39_cluster_size_cap" ->
      s"""WITH labels AS MATERIALIZED (
         |  SELECT doc_id, cluster_keeper
         |  FROM (${TextOps.oracleSql("d8_dedup_clusters")}) t),
         |sizes AS (
         |  SELECT cluster_keeper, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM labels GROUP BY 1)
         |SELECT doc_id, cluster_keeper, cluster_size,
         |  cluster_size > 5 AS boilerplate,
         |  (cluster_size > 5 OR doc_id = cluster_keeper) AS keep
         |FROM labels JOIN sizes USING (cluster_keeper)
         |ORDER BY doc_id""".stripMargin,

    "m19_loudness_gain" ->
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
      "  FROM m WHERE n_smp > 0)\n" +
      ", e AS (\n" +
      "  SELECT media_id, n_smp, smp,\n" +
      "    list_reduce(list_prepend(CAST(0 AS BIGINT),\n" +
      "      list_transform(smp, v -> v * v)), (a, x) -> a + x) AS energy_sq\n" +
      "  FROM s)\n" +
      ", g AS (\n" +
      "  SELECT media_id, n_smp, smp,\n" +
      "    round(sqrt(CAST(energy_sq AS DOUBLE) / n_smp), 6) AS rms\n" +
      "  FROM e WHERE energy_sq > 0)\n" +
      ", g2 AS (SELECT *, round(3276.8 / rms, 6) AS gain FROM g)\n" +
      "SELECT media_id, CAST(n_smp AS BIGINT) AS n_smp, rms, gain,\n" +
      "  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),\n" +
      "    list_transform(smp, v -> CASE WHEN\n" +
      "      abs(CAST(v AS DOUBLE) * gain) > 32767.0\n" +
      "      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),\n" +
      "    (a, x) -> a + x) AS BIGINT) AS n_would_clip,\n" +
      "  list_reduce(list_prepend(CAST(0 AS BIGINT),\n" +
      "    list_transform(smp, v -> CASE WHEN\n" +
      "      abs(CAST(v AS DOUBLE) * gain) > 32767.0\n" +
      "      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),\n" +
      "    (a, x) -> a + x) = 0 AS safe\n" +
      "FROM g2 ORDER BY media_id"),
  )
}
