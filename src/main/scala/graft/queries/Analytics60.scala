package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 67 (SURVEY.md §2.4):
  *
  *  - q212: bitmap-sketch distinct rollup — the fixed-width bitmap
  *    alternative to HLL for bounded-error distinct counting: each
  *    user hashes into one of 4092 buckets (66 words × 62 bits — 62
  *    so no shift ever reaches the sign bit, which DuckDB rejects),
  *    per-type bitmaps build with a bit_or aggregate (mergeable,
  *    map-side combinable, 66 longs per group REGARDLESS of
  *    cardinality), and the linear-counting estimate
  *    −m·ln(V₀/m) corrects for collisions. The exact distinct runs
  *    beside it so the output carries its own error audit. Everything
  *    before the 5-row grid is integer-exact.
  */
object Analytics60 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q212_bitmap_rollup" -> ((spark, dir) => {
      val M = 4092 // 66 words x 62 bits
      val h = pmod(graft.functions.Md5Pack(col("user_id").cast("string")),
        lit(M))
      val ev = t(spark, dir, "events")
        .select(col("event_type"), col("user_id"), h.as("h"))
      val words = ev
        .select(col("event_type"), col("user_id"),
          (col("h") / 62).cast("long").as("word"),
          (col("h") % 62).cast("int").as("bit"))
        .groupBy("event_type", "word")
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("m"))
      val occupied = words.groupBy("event_type")
        .agg(sum(bit_count(col("m")).cast("long")).as("n_bits_set"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      occupied.join(exact, "event_type")
        .select(col("event_type"), col("n_bits_set"), col("exact_distinct"),
          // a saturated bitmap (every bucket hit) has no finite estimate
          when(col("n_bits_set") < M,
            round(lit(-1.0 * M)
              * log((lit(M) - col("n_bits_set")).cast("double") / M), 2))
            .as("linear_estimate"),
          (col("n_bits_set") >= M).as("saturated"))
        .orderBy("event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q212_bitmap_rollup" -> {
      val h = Tables.duckMd5Pack("CAST(user_id AS VARCHAR)")
      s"""WITH ev AS (
         |  SELECT event_type, user_id, ($h) % 4092 AS h FROM events),
         |words AS (
         |  SELECT event_type, h // 62 AS word,
         |    bit_or(CAST(1 AS BIGINT) << CAST(h % 62 AS INTEGER)) AS m
         |  FROM ev GROUP BY 1, 2),
         |occ AS (
         |  SELECT event_type,
         |    CAST(sum(bit_count(m)) AS BIGINT) AS n_bits_set
         |  FROM words GROUP BY 1),
         |ex AS (
         |  SELECT event_type,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
         |  FROM ev GROUP BY 1)
         |SELECT event_type, n_bits_set, exact_distinct,
         |  CASE WHEN n_bits_set < 4092 THEN
         |    round(-1.0 * 4092
         |      * ln(CAST(4092 - n_bits_set AS DOUBLE) / 4092), 2)
         |  END AS linear_estimate,
         |  n_bits_set >= 4092 AS saturated
         |FROM occ JOIN ex USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
  )
}
