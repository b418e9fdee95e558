package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 68 (SURVEY.md §2.4):
  *
  *  - q213: signed integer division/modulo pins — the cross-engine
  *    contract every composite-key and bucketing query silently leans
  *    on: Spark's `div` TRUNCATES toward zero while DuckDB's `//`
  *    FLOORS (they differ on negatives!), `%` follows the dividend's
  *    sign in both, and `pmod` is the always-nonnegative form. The
  *    oracle replays Spark's truncation explicitly, so an engine
  *    changing this breaks one labeled query, not dozens of hashes.
  *    The grid is anchored to the nation table so the pin runs through
  *    the real scan + codegen path.
  *  - q214: calendar convention pins — ISO day-of-week derived from
  *    Spark's Sunday-1 `dayofweek` checked against DuckDB's native
  *    `isodow`, Monday week truncation, quarter boundaries, last_day
  *    and month lengths, over the bounded distinct-order-date grid.
  */
object Analytics61 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q213_intdiv_semantics" -> ((spark, dir) => {
      val n = t(spark, dir, "nation")
        .select((col("n_nationkey") - 12).cast("long").as("n"))
      n.crossJoin(spark.range(2).select(
          when(col("id") === 0, 5L).otherwise(-5L).as("d")))
        .select(col("n"), col("d"),
          expr("n div d").as("trunc_div"),
          floor(col("n").cast("double") / col("d")).cast("long")
            .as("floor_div"),
          (col("n") % col("d")).as("mod_dividend_sign"),
          // pmod pinned for POSITIVE modulus only — its contract: with a
          // negative modulus Spark can return negatives, a corner no
          // query in this repo relies on
          pmod(col("n"), abs(col("d"))).as("pmod_val"))
        .orderBy("n", "d")
    }),

    "q214_calendar_pins" -> ((spark, dir) => {
      val days = t(spark, dir, "orders")
        .select(to_date(col("o_orderdate")).as("d"))
        .distinct().orderBy("d").limit(25)
      days.select(col("d"),
          // ISO day-of-week from Spark's Sunday-1 convention
          (((dayofweek(col("d")) + 5) % 7) + 1).as("dow_iso"),
          date_trunc("week", col("d")).cast("date").as("week_start"),
          quarter(col("d")).as("q"),
          last_day(col("d")).as("month_end"),
          dayofmonth(last_day(col("d"))).as("days_in_month"),
          datediff(col("d"), date_trunc("year", col("d")).cast("date"))
            .as("doy0"))
        .orderBy("d")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q213_intdiv_semantics" ->
      """WITH g AS (
        |  SELECT CAST(n_nationkey - 12 AS BIGINT) AS n, d
        |  FROM nation CROSS JOIN (VALUES (CAST(5 AS BIGINT)),
        |    (CAST(-5 AS BIGINT))) t(d))
        |SELECT n, d,
        |  CAST(trunc(CAST(n AS DOUBLE) / d) AS BIGINT) AS trunc_div,
        |  CAST(floor(CAST(n AS DOUBLE) / d) AS BIGINT) AS floor_div,
        |  n % d AS mod_dividend_sign,
        |  ((n % abs(d)) + abs(d)) % abs(d) AS pmod_val
        |FROM g ORDER BY n, d""".stripMargin,

    "q214_calendar_pins" ->
      """WITH days AS (
        |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
        |  FROM orders ORDER BY d LIMIT 25)
        |SELECT d,
        |  CAST(isodow(d) AS INTEGER) AS dow_iso,
        |  CAST(date_trunc('week', d) AS DATE) AS week_start,
        |  CAST(quarter(d) AS INTEGER) AS q,
        |  last_day(d) AS month_end,
        |  CAST(day(last_day(d)) AS INTEGER) AS days_in_month,
        |  CAST(d - CAST(date_trunc('year', d) AS DATE) AS INTEGER) AS doy0
        |FROM days ORDER BY d""".stripMargin,
  )
}
