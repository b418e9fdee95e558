package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 85 dedup/multimodal ops (SURVEY.md §2.4):
  *
  *  - d44: consistent-hash rebalance audit — the shard-assignment math
  *    that decides how much data MOVES when the cluster grows: each
  *    doc hashes to a ring position; its shard is the nearest ring
  *    node clockwise. Growing 8 → 9 nodes moves only the docs whose
  *    arc the new node captured (≈ 1/9 of them), while naive
  *    hash-mod-N reassigns almost everything. The query measures both
  *    movement fractions side by side — the justification every
  *    sharded system gives for rings over mod. Ring nodes are 8/9
  *    md5-hashed literals (broadcast grid); doc assignment is a
  *    groupBy-argmin over the tiny cross product.
  *  - m21: stereo channel roundtrip — deinterleave the PCM stream
  *    (m7 decode) into even/odd channels, reinterleave, and prove the
  *    result byte-identical: the array-surgery pin (slice/filter/
  *    zip-reassembly) that guards any layout-conversion code. Pure
  *    per-row HOFs.
  */
object TextOps45 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d44_consistent_hash_rebalance" -> ((spark, dir) => {
      val M = 1000000L
      def ringDf(n: Int) = {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        val rows = (0 until n).map(i => Row(i.toLong))
        spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("node", LongType))))
          .select(col("node"),
            pmod(graft.functions.Md5Pack(
              concat(lit("node-"), col("node").cast("string"))), lit(M))
              .as("npos"))
      }
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"),
          pmod(graft.functions.Md5Pack(col("doc_id").cast("string")),
            lit(M)).as("h"))
      def assign(ring: DataFrame, out: String): DataFrame =
        docs.crossJoin(broadcast(ring))
          // clockwise distance from doc to node, wrapping the ring
          .withColumn("dist", pmod(col("npos") - col("h"), lit(M)))
          .groupBy("doc_id", "h")
          .agg(min_by(col("node"), struct(col("dist"), col("node")))
            .as(out))
      val a8 = assign(ringDf(8), "s8")
      val a9 = assign(ringDf(9), "s9")
      a8.join(a9, Seq("doc_id", "h"))
        .withColumn("mod8", pmod(col("h"), lit(8)))
        .withColumn("mod9", pmod(col("h"), lit(9)))
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("s8") =!= col("s9")).as("moved_ring"),
          count_if(col("mod8") =!= col("mod9")).as("moved_mod"))
        .select(col("n_docs"), col("moved_ring"), col("moved_mod"),
          round(col("moved_ring").cast("double")
            / col("n_docs").cast("double"), 6).as("ring_frac"),
          round(col("moved_mod").cast("double")
            / col("n_docs").cast("double"), 6).as("mod_frac"))
    }),

    "m21_channel_roundtrip" -> ((spark, dir) => {
      val pcm = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          hex(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")).as("hx"),
          (octet_length(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")) / 2)
            .cast("long").as("n_smp"))
        .filter(col("n_smp") >= 2)
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
        .withColumn("left_ch",
          expr("filter(transform(smp, (v, i) -> struct(v, i)), s -> s.i % 2 = 0)"))
        .withColumn("right_ch",
          expr("filter(transform(smp, (v, i) -> struct(v, i)), s -> s.i % 2 = 1)"))
        .withColumn("rebuilt", expr(
          """flatten(transform(sequence(0, CAST(size(right_ch) - 1 AS INT)),
            |  j -> CASE WHEN j * 2 + 2 <= size(smp)
            |    THEN array(left_ch[j].v, right_ch[j].v)
            |    ELSE array(left_ch[j].v) END))""".stripMargin))
        .withColumn("rebuilt_full",
          when(size(col("left_ch")) > size(col("right_ch")),
            concat(col("rebuilt"),
              array(element_at(col("left_ch"), -1).getField("v"))))
            .otherwise(col("rebuilt")))
        .select(col("media_id"), col("n_smp"),
          size(col("left_ch")).cast("long").as("n_left"),
          size(col("right_ch")).cast("long").as("n_right"),
          (col("rebuilt_full") === col("smp")).as("lossless"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "d44_consistent_hash_rebalance" -> {
      val M = 1000000L
      def ring(n: Int) = (0 until n).map(i =>
        s"SELECT $i AS node, (${Tables.duckMd5Pack(s"'node-$i'")}) % $M AS npos")
        .mkString("\nUNION ALL ")
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    (${Tables.duckMd5Pack("CAST(doc_id AS VARCHAR)")}) % $M AS h
         |  FROM documents),
         |ring8 AS (${ring(8)}),
         |ring9 AS (${ring(9)}),
         |a8 AS (
         |  SELECT doc_id, h, node AS s8 FROM (
         |    SELECT doc_id, h, node, row_number() OVER (
         |      PARTITION BY doc_id
         |      ORDER BY ((npos - h) % $M + $M) % $M, node) AS rn
         |    FROM docs CROSS JOIN ring8) WHERE rn = 1),
         |a9 AS (
         |  SELECT doc_id, h, node AS s9 FROM (
         |    SELECT doc_id, h, node, row_number() OVER (
         |      PARTITION BY doc_id
         |      ORDER BY ((npos - h) % $M + $M) % $M, node) AS rn
         |    FROM docs CROSS JOIN ring9) WHERE rn = 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (s8 <> s9) AS BIGINT) AS moved_ring,
         |  CAST(count(*) FILTER (a8.h % 8 <> a8.h % 9) AS BIGINT)
         |    AS moved_mod,
         |  round(CAST(count(*) FILTER (s8 <> s9) AS DOUBLE) / count(*), 6)
         |    AS ring_frac,
         |  round(CAST(count(*) FILTER (a8.h % 8 <> a8.h % 9) AS DOUBLE)
         |    / count(*), 6) AS mod_frac
         |FROM a8 JOIN a9 USING (doc_id)""".stripMargin
    },

    "m21_channel_roundtrip" ->
      ("WITH m AS (\n" +
      "  SELECT doc_id AS media_id, hex(encode(text || 'ÿÿ')) AS hx,\n" +
      "    octet_length(encode(text || 'ÿÿ')) // 2 AS n_smp\n" +
      "  FROM documents WHERE text IS NOT NULL)\n" +
      "SELECT media_id, CAST(n_smp AS BIGINT) AS n_smp,\n" +
      "  CAST((n_smp + 1) // 2 AS BIGINT) AS n_left,\n" +
      "  CAST(n_smp // 2 AS BIGINT) AS n_right,\n" +
      "  TRUE AS lossless\n" +
      "FROM m WHERE n_smp >= 2 ORDER BY media_id"),
  )
}
