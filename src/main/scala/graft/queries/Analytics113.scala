package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 130 (SURVEY.md §2.4):
  *
  *  - q298: SAX symbolization of the monthly-revenue series —
  *    Piecewise Aggregate Approximation into 12 segments + the
  *    standard 5-symbol Gaussian breakpoints (−0.84, −0.25, 0.25,
  *    0.84). The time-series indexing/compression primitive: a 100 TB
  *    fact table condenses to a calendar-bounded monthly frame FIRST
  *    (exact DECIMAL revenue sums, map-side combinable), so the
  *    window/PAA stage runs on ≤ hundreds of rows regardless of SF.
  *    Z-scores are rounded once to DECIMAL(18,9), making the per-
  *    segment PAA average an exact decimal mean — no float-order
  *    drift between engines. Segment assignment is the explicit
  *    floor((rn−1)·12/n) PAA rule, portable across engines.
  *
  *  - q299: Luhn checksum audit over synthetic 15-digit account ids
  *    (zero-padded order keys): mod-10 double-every-second-digit in
  *    pure built-in higher-order functions (transform + aggregate) —
  *    the PII/plausibility primitive for card-number-shaped strings,
  *    kept fully codegen-friendly (no UDF). Output: residue histogram
  *    (residue 0 = Luhn-valid).
  */
object Analytics113 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q298_sax_symbols" -> ((spark, dir) => {
      val monthly = t(spark, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(sum(expr("cast(round(o_totalprice, 2) as decimal(18,2))"))
          .as("rev"))
      // rev*rev is exact DECIMAL — no rounding step needed
      val stats = monthly.agg(count(lit(1)).as("nm"),
        sum(col("rev")).as("sr"),
        sum(expr("cast(rev * rev as decimal(38,4))")).as("srr"))
      val z = monthly.crossJoin(broadcast(stats))
        .select(col("m"), col("nm"),
          expr(
            """cast(round(
              |  (cast(rev as double) - cast(sr as double) / nm)
              |  / sqrt(cast(srr as double) / nm
              |    - (cast(sr as double) / nm) * (cast(sr as double) / nm)),
              |  9) as decimal(18,9))""".stripMargin).as("z"))
        .withColumn("rn", row_number().over(Window.orderBy("m")))
        // integer `div`, NOT cast(double): CAST(2.5 AS INT) truncates in
        // Spark but rounds in DuckDB — the PAA rule must stay integral
        .withColumn("seg", expr("((rn - 1) * 12) div nm"))
      z.groupBy("seg")
        // exact decimal sum ÷ count, NOT avg(): engines disagree on
        // whether avg(DECIMAL) accumulates exactly or in doubles
        .agg(count(lit(1)).as("n_months"), sum(col("z")).as("sz"))
        .withColumn("paa_d", expr("cast(sz as double) / n_months"))
        .select(col("seg"), col("n_months"),
          round(col("paa_d"), 6).as("paa"),
          expr(
            """case when paa_d < -0.84 then 'a'
              |     when paa_d < -0.25 then 'b'
              |     when paa_d <  0.25 then 'c'
              |     when paa_d <  0.84 then 'd'
              |     else 'e' end""".stripMargin).as("symbol"))
        .orderBy("seg")
    }),

    "q299_luhn_residues" -> ((spark, dir) => {
      val acct = t(spark, dir, "orders")
        .select(lpad(col("o_orderkey").cast("string"), 15, "0").as("acct"))
      // Luhn: from the RIGHT, double every 2nd digit; with a fixed
      // 15-byte field, right-position r = 16 − i, doubled when r is
      // even ⇔ i is even.
      val luhn = acct.select(expr(
        """aggregate(
          |  transform(sequence(1, 15), i ->
          |    case when i % 2 = 0
          |      then if(cast(substring(acct, i, 1) as int) > 4,
          |              cast(substring(acct, i, 1) as int) * 2 - 9,
          |              cast(substring(acct, i, 1) as int) * 2)
          |      else cast(substring(acct, i, 1) as int) end),
          |  0, (s, d) -> s + d) % 10""".stripMargin).cast("long")
        .as("residue"))
      luhn.groupBy("residue").agg(count(lit(1)).as("n_orders"))
        .orderBy("residue")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q298_sax_symbols" -> """
      WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
          sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS nm, sum(rev) AS sr,
          sum(CAST(rev * rev AS DECIMAL(38,4))) AS srr
        FROM monthly),
      z AS (
        SELECT m, nm,
          CAST(round(
            (CAST(rev AS DOUBLE) - CAST(sr AS DOUBLE) / nm)
            / sqrt(CAST(srr AS DOUBLE) / nm
              - (CAST(sr AS DOUBLE) / nm) * (CAST(sr AS DOUBLE) / nm)),
            9) AS DECIMAL(18,9)) AS z,
          row_number() OVER (ORDER BY m) AS rn
        FROM monthly CROSS JOIN stats),
      seg AS (
        SELECT ((rn - 1) * 12) // nm AS seg, z FROM z),
      paa AS (
        SELECT seg, CAST(count(*) AS BIGINT) AS n_months,
          CAST(sum(z) AS DOUBLE) / count(*) AS paa_d
        FROM seg GROUP BY seg)
      SELECT seg, n_months,
        round(CAST(paa_d AS DOUBLE), 6) AS paa,
        CASE WHEN paa_d < -0.84 THEN 'a'
             WHEN paa_d < -0.25 THEN 'b'
             WHEN paa_d <  0.25 THEN 'c'
             WHEN paa_d <  0.84 THEN 'd'
             ELSE 'e' END AS symbol
      FROM paa ORDER BY seg""",

    "q299_luhn_residues" -> """
      WITH acct AS (
        SELECT lpad(CAST(o_orderkey AS VARCHAR), 15, '0') AS acct
        FROM orders),
      luhn AS (
        SELECT CAST(list_sum(list_transform(generate_series(1, 15), i ->
            CASE WHEN i % 2 = 0
              THEN CASE WHEN CAST(substring(acct, CAST(i AS INT), 1) AS INT) > 4
                THEN CAST(substring(acct, CAST(i AS INT), 1) AS INT) * 2 - 9
                ELSE CAST(substring(acct, CAST(i AS INT), 1) AS INT) * 2 END
              ELSE CAST(substring(acct, CAST(i AS INT), 1) AS INT) END))
            AS BIGINT) % 10 AS residue
        FROM acct)
      SELECT residue, CAST(count(*) AS BIGINT) AS n_orders
      FROM luhn GROUP BY residue ORDER BY residue""",
  )
}
