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
  )
}
