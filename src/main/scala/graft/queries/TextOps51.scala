package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 97 multimodal ops (SURVEY.md §2.4):
  *
  *  - m23: A/V sync drift estimate — the lip-sync check: the offset
  *    between two streams is the lag that maximizes the
  *    cross-correlation of their energy envelopes. Stand-ins: the
  *    even/odd-sample channels (m21's deinterleave) each reduce to an
  *    8-bucket amplitude envelope (m18's machinery), and the best lag in
  *    −2..2 is the argmax of the exact integer dot product of amplitude sums (bounded, overflow-free) (ties →
  *    smaller |lag|, then negative first). Everything integer until
  *    the normalized score's single division.
  */
object TextOps51 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m23_av_sync" -> ((spark, dir) => {
      val pcm = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id").as("media_id"),
          hex(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")).as("hx"),
          (octet_length(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")) / 2)
            .cast("long").as("n_smp"))
        .filter(col("n_smp") >= 32)
        .withColumn("smp", expr(
          """transform(
            |  transform(sequence(0L, n_smp - 1),
            |    i -> CAST(conv(concat(
            |           substring(hx, CAST(i*4+3 AS INT), 2),
            |           substring(hx, CAST(i*4+1 AS INT), 2)), 16, 10)
            |         AS BIGINT)),
            |  v -> CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)"""
            .stripMargin))
        .withColumn("lch", expr(
          "transform(filter(transform(smp, (v, i) -> struct(v, i)), " +
            "s -> s.i % 2 = 0), s -> s.v)"))
        .withColumn("rch", expr(
          "transform(filter(transform(smp, (v, i) -> struct(v, i)), " +
            "s -> s.i % 2 = 1), s -> s.v)"))
      def envelope(ch: String): String =
        s"""transform(sequence(0, 7), b ->
           |  aggregate(slice($ch,
           |    CAST(size($ch) * b div 8 + 1 AS INT),
           |    CAST(size($ch) * (b + 1) div 8 - size($ch) * b div 8 AS INT)),
           |  0L, (a, v) -> a + abs(v)))""".stripMargin
      val env = pcm
        .withColumn("ea", expr(envelope("lch")))
        .withColumn("eb", expr(envelope("rch")))
      // dot product of ea vs eb shifted by lag, over the overlap window
      def dotAt(lag: Int): String = {
        val (aLo, bLo, n) =
          if (lag >= 0) (lag, 0, 8 - lag) else (0, -lag, 8 + lag)
        (0 until n).map(i => s"ea[${aLo + i}] * eb[${bLo + i}]")
          .mkString(" + ")
      }
      val lags = Seq(0, -1, 1, -2, 2) // tie preference order
      val best = lags.tail.foldLeft(
        expr(s"named_struct('lag', 0, 'dot', ${dotAt(0)})")) { (acc, lg) =>
        val cand = expr(s"named_struct('lag', $lg, 'dot', ${dotAt(lg)})")
        when(cand.getField("dot") > acc.getField("dot"), cand).otherwise(acc)
      }
      env.select(col("media_id"),
          best.getField("lag").as("best_lag"),
          best.getField("dot").as("best_dot"),
          expr(dotAt(0)).as("dot0"))
        .withColumn("in_sync", col("best_lag") === 0)
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "m23_av_sync" -> {
      def envelope(ch: String): String =
        s"""list_transform(range(8), b ->
           |      list_reduce(list_prepend(CAST(0 AS BIGINT),
           |        list_transform(list_slice($ch,
           |          len($ch) * b // 8 + 1, len($ch) * (b + 1) // 8),
           |          v -> abs(v))), (a, x) -> a + x))""".stripMargin
      def dotAt(lag: Int): String = {
        val (aLo, bLo, n) =
          if (lag >= 0) (lag, 0, 8 - lag) else (0, -lag, 8 + lag)
        (0 until n).map(i => s"ea[${aLo + i + 1}] * eb[${bLo + i + 1}]")
          .mkString(" + ")
      }
      val lags = Seq(0, -1, 1, -2, 2)
      val best = lags.tail.foldLeft(
        s"struct_pack(lag := 0, dot := ${dotAt(0)})") { (acc, lg) =>
        val cand = s"struct_pack(lag := $lg, dot := ${dotAt(lg)})"
        s"CASE WHEN ($cand).dot > ($acc).dot THEN $cand ELSE $acc END"
      }
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
      "  FROM m WHERE n_smp >= 32)\n" +
      ", ch AS (\n" +
      "  SELECT media_id,\n" +
      "    list_transform(list_filter(list_transform(smp,\n" +
      "      (v, i) -> struct_pack(v := v, i := i)),\n" +
      "      s -> (s.i - 1) % 2 = 0), s -> s.v) AS lch,\n" +
      "    list_transform(list_filter(list_transform(smp,\n" +
      "      (v, i) -> struct_pack(v := v, i := i)),\n" +
      "      s -> (s.i - 1) % 2 = 1), s -> s.v) AS rch\n" +
      "  FROM s)\n" +
      ", env AS (\n" +
      s"  SELECT media_id, ${envelope("lch")} AS ea,\n" +
      s"    ${envelope("rch")} AS eb\n" +
      "  FROM ch)\n" +
      s"SELECT media_id, ($best).lag AS best_lag,\n" +
      s"  CAST(($best).dot AS BIGINT) AS best_dot,\n" +
      s"  CAST(${dotAt(0)} AS BIGINT) AS dot0,\n" +
      s"  ($best).lag = 0 AS in_sync\n" +
      "FROM env ORDER BY media_id")
    },
  )
}
