package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 60 (SURVEY.md §2.4):
  *
  *  - q199: rounding + collation pins — the numeric and string corners
  *    every oracle comparison in this repo silently relies on:
  *    HALF_UP-away-from-zero decimal rounding (±2.5), double rounding
  *    through the canonical decimal representation (2.675 → 2.68, NOT
  *    the naive binary-expansion 2.67), and binary (codepoint)
  *    collation ('B' < 'a'). Pinned explicitly so an engine or JVM
  *    upgrade that changes them fails one obvious query instead of
  *    corrupting dozens of downstream hashes.
  *  - q200: shipment continuity census — per supplier, the active
  *    month span vs the months actually shipped; suppliers with gap
  *    months surface with exact counts. One groupBy; the span/gap
  *    arithmetic is pure integers.
  */
object Analytics54 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_rounding_collation" -> ((spark, dir) => {
      // anchored to the table so the pin runs through the same scan +
      // codegen path as real queries (constant-folding included)
      val one = t(spark, dir, "orders").limit(1).select(lit(1).as("one"))
      one.select(
          round(lit(BigDecimal("2.5"))).cast("string").as("dec_half_up"),
          round(lit(BigDecimal("-2.5"))).cast("string").as("dec_half_neg"),
          round(lit(2.675), 2).cast("string").as("dbl_repr_round"),
          round(lit(-2.675), 2).cast("string").as("dbl_repr_neg"),
          (lit("B") < lit("a")).cast("string").as("binary_collation_lt"),
          greatest(lit("a"), lit("B")).as("binary_greatest"))
        .select(expr(
          "stack(6, " +
            "'binary_collation_lt', binary_collation_lt, " +
            "'binary_greatest', binary_greatest, " +
            "'dbl_repr_neg', dbl_repr_neg, " +
            "'dbl_repr_round', dbl_repr_round, " +
            "'dec_half_neg', dec_half_neg, " +
            "'dec_half_up', dec_half_up) AS (pin_case, value)"))
        .orderBy("pin_case")
    }),

    "q200_shipment_gaps" -> ((spark, dir) => {
      val m = t(spark, dir, "lineitem")
        .groupBy(col("l_suppkey"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("mx"))
        .agg(count(lit(1)).as("n"))
      m.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_active_months"),
          (max(col("mx")) - min(col("mx")) + 1).as("span_months"))
        .withColumn("n_gap_months",
          col("span_months") - col("n_active_months"))
        .filter(col("n_gap_months") > 0)
        .select(col("l_suppkey"), col("n_active_months"),
          col("span_months"), col("n_gap_months"))
        .orderBy(col("n_gap_months").desc, col("l_suppkey"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q199_rounding_collation" ->
      """WITH one AS (SELECT 1 FROM orders LIMIT 1)
        |SELECT 'binary_collation_lt' AS pin_case,
        |  CAST('B' < 'a' AS VARCHAR) AS value FROM one
        |UNION ALL SELECT 'binary_greatest', greatest('a', 'B') FROM one
        |UNION ALL SELECT 'dbl_repr_neg',
        |  CAST(round(CAST(-2.675 AS DOUBLE), 2) AS VARCHAR) FROM one
        |UNION ALL SELECT 'dbl_repr_round',
        |  CAST(round(CAST(2.675 AS DOUBLE), 2) AS VARCHAR) FROM one
        |UNION ALL SELECT 'dec_half_neg',
        |  CAST(round(CAST(-2.5 AS DECIMAL(2,1))) AS VARCHAR) FROM one
        |UNION ALL SELECT 'dec_half_up',
        |  CAST(round(CAST(2.5 AS DECIMAL(2,1))) AS VARCHAR) FROM one
        |ORDER BY pin_case""".stripMargin,

    "q200_shipment_gaps" ->
      """WITH m AS (
        |  SELECT l_suppkey,
        |    CAST(EXTRACT(year FROM l_shipdate) * 12
        |      + EXTRACT(month FROM l_shipdate) AS BIGINT) AS mx,
        |    count(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |g AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_active_months,
        |    CAST(max(mx) - min(mx) + 1 AS BIGINT) AS span_months
        |  FROM m GROUP BY 1)
        |SELECT l_suppkey, n_active_months, span_months,
        |  span_months - n_active_months AS n_gap_months
        |FROM g WHERE span_months - n_active_months > 0
        |ORDER BY n_gap_months DESC, l_suppkey""".stripMargin,
  )
}
