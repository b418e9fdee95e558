package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 18 (SURVEY.md §2.4):
  *
  *  - q128: bloom false-positive-rate audit — the sketch-validation
  *    query for the bloom family: a hand-rolled Kirsch–Mitzenmacher
  *    bloom (k=5 probes into m=4096 bits, md5-packed double hashing)
  *    materialized as a 64-word bit_or bitmap (the q111 device — bit
  *    63 CASEs to the Long.MinValue literal because DuckDB's 1<<63
  *    errors), probed by every out-of-segment customer; measured FPR
  *    sits next to the density-based expectation ρ^k (ρ = measured
  *    fill fraction, powered by explicit multiplies — no libm pow
  *    parity surface). Unlike q29's runtime-filter bloom (engine
  *    internal), every bit here replays in the oracle.
  *  - q129: lagged autocorrelation — the time-series diagnostic over
  *    daily revenue: ACF at calendar lags 1..7, computed entirely in
  *    exact decimals via the q123 n-scaling device (n·x_t − total
  *    replaces x_t − x̄, so no float mean ever exists); one float
  *    division per lag at the very end. The lag join is a
  *    calendar-bounded self-join on date arithmetic.
  */
object Analytics16 {
  import Tables.t

  private val BloomWords = 64 // m = 4096 bits
  private val BloomK = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_bloom_fpr_audit" -> ((spark, dir) => {
      val cust = t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          graft.functions.Md5Pack(col("c_custkey").cast("string")).as("h"))
        .withColumn("h1", col("h") % 1000003L)
        // integer div, NOT `/`: Column./ routes a 62-bit long through
        // double and the rounded quotient can truncate differently
        .withColumn("h2", lit(1L) + expr("h div 2147483648") % 999983L)
      def positions(df: DataFrame) = df
        .select(col("c_custkey"), col("c_mktsegment"),
          explode(expr(s"transform(sequence(0, ${BloomK - 1}), i -> " +
            "(h1 + i * h2) % 4096)")).as("pos"))
      val buildPos = positions(cust.filter(col("c_mktsegment") === "BUILDING"))
      val shiftBit = expr("CASE WHEN pos % 64 = 63 THEN " +
        "-9223372036854775808 ELSE shiftleft(1L, CAST(pos % 64 AS INT)) END")
      val bitmap = buildPos
        .select((col("pos") / 64).cast("long").as("word"),
          shiftBit.as("bits"))
        .groupBy("word").agg(bit_or(col("bits")).as("word_val"))
      val probePos = positions(
        cust.filter(col("c_mktsegment") =!= "BUILDING"))
        .select(col("c_custkey"),
          (col("pos") / 64).cast("long").as("word"), shiftBit.as("bits"))
      val probeHits = probePos.join(broadcast(bitmap), Seq("word"), "left")
        .groupBy("c_custkey")
        .agg(count_if(coalesce(col("word_val"), lit(0L))
          .bitwiseAND(col("bits")) =!= 0).as("n_set"))
      val stats = cust.agg(
        count_if(col("c_mktsegment") === "BUILDING").as("n_build"),
        count_if(col("c_mktsegment") =!= "BUILDING").as("n_probe"))
      val density = bitmap.agg(sum(bit_count(col("word_val"))).as("bits_set"))
      probeHits.agg(count_if(col("n_set") === BloomK).as("n_fp"))
        .crossJoin(broadcast(stats)).crossJoin(broadcast(density))
        .withColumn("fpr", round(col("n_fp").cast("double") /
          col("n_probe"), 6))
        .withColumn("rho", col("bits_set").cast("double") / 4096)
        .withColumn("expected_fpr", round(col("rho") * col("rho") *
          col("rho") * col("rho") * col("rho"), 6))
        .select("n_build", "n_probe", "bits_set", "n_fp", "fpr",
          "expected_fpr")
    }),

    "q129_autocorrelation" -> ((spark, dir) => {
      val daily = t(spark, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      val totals = daily.agg(count(lit(1)).as("n"),
        sum(col("rev")).as("total"))
      // the q123 device: cd = n·x_t − total is exact decimal; every
      // ACF numerator/denominator is a sum of cd products
      // cd fits DECIMAL(19,4) with wide margin, so cd·cd stays inside
      // both engines' 38-digit multiply limit with no precision loss
      val centered = daily.crossJoin(broadcast(totals))
        .select(col("day"),
          (col("rev") * col("n") - col("total")).cast("decimal(19,4)")
            .as("cd"))
      val denom = centered
        .agg(sum((col("cd") * col("cd")).cast("decimal(38,8)")).as("ss"))
      val lags = centered.select(col("day"), col("cd"))
      val shifted = centered.select(col("day").as("lag_day"),
        col("cd").as("cd_lag"))
      lags
        .crossJoin(broadcast(spark.range(1, 8).select(col("id").as("lag"))))
        .join(shifted, date_add(col("lag_day"), expr("CAST(lag AS INT)"))
          === col("day"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("cd") * col("cd_lag")).cast("decimal(38,8)")).as("sp"))
        .crossJoin(broadcast(denom))
        .select(col("lag"), col("n_pairs"),
          round(col("sp").cast("double") / col("ss").cast("double"), 6)
            .as("acf"))
        .orderBy("lag")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q128_bloom_fpr_audit" -> {
      val h = Tables.duckMd5Pack("CAST(c_custkey AS VARCHAR)")
      s"""WITH cust AS (
         |  SELECT c_custkey, c_mktsegment, $h AS h FROM customer),
         |hh AS (
         |  SELECT c_custkey, c_mktsegment, h % 1000003 AS h1,
         |    1 + (h // 2147483648) % 999983 AS h2
         |  FROM cust),
         |pos AS (
         |  SELECT c_custkey, c_mktsegment,
         |    (h1 + r.i * h2) % 4096 AS pos
         |  FROM hh, UNNEST(range($BloomK)) AS r(i)),
         |pb AS (
         |  SELECT pos // 64 AS word,
         |    CASE WHEN pos % 64 = 63 THEN -9223372036854775808
         |      ELSE (1::BIGINT << CAST(pos % 64 AS INTEGER)) END AS bits
         |  FROM pos WHERE c_mktsegment = 'BUILDING'),
         |bitmap AS (
         |  SELECT word, bit_or(bits) AS word_val FROM pb GROUP BY word),
         |probe AS (
         |  SELECT c_custkey, pos // 64 AS word,
         |    CASE WHEN pos % 64 = 63 THEN -9223372036854775808
         |      ELSE (1::BIGINT << CAST(pos % 64 AS INTEGER)) END AS bits
         |  FROM pos WHERE c_mktsegment <> 'BUILDING'),
         |hits AS (
         |  SELECT c_custkey,
         |    CAST(count(*) FILTER (
         |      WHERE (coalesce(word_val, 0) & bits) <> 0) AS BIGINT)
         |      AS n_set
         |  FROM probe LEFT JOIN bitmap USING (word)
         |  GROUP BY c_custkey),
         |stats AS (
         |  SELECT
         |    CAST(count(*) FILTER (WHERE c_mktsegment = 'BUILDING')
         |      AS BIGINT) AS n_build,
         |    CAST(count(*) FILTER (WHERE c_mktsegment <> 'BUILDING')
         |      AS BIGINT) AS n_probe
         |  FROM cust),
         |density AS (
         |  SELECT CAST(sum(bit_count(word_val)) AS BIGINT) AS bits_set
         |  FROM bitmap),
         |fp AS (
         |  SELECT CAST(count(*) FILTER (WHERE n_set = $BloomK) AS BIGINT)
         |    AS n_fp
         |  FROM hits)
         |SELECT n_build, n_probe, bits_set, n_fp,
         |  round(CAST(n_fp AS DOUBLE) / n_probe, 6) AS fpr,
         |  round((CAST(bits_set AS DOUBLE) / 4096)
         |    * (CAST(bits_set AS DOUBLE) / 4096)
         |    * (CAST(bits_set AS DOUBLE) / 4096)
         |    * (CAST(bits_set AS DOUBLE) / 4096)
         |    * (CAST(bits_set AS DOUBLE) / 4096), 6) AS expected_fpr
         |FROM fp CROSS JOIN stats CROSS JOIN density""".stripMargin
    },

    "q129_autocorrelation" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS total
        |  FROM daily),
        |centered AS (
        |  SELECT day, CAST(rev * n - total AS DECIMAL(19,4)) AS cd
        |  FROM daily CROSS JOIN tot),
        |denom AS (
        |  SELECT sum(CAST(cd * cd AS DECIMAL(38,8))) AS ss
        |  FROM centered),
        |pairs AS (
        |  SELECT l.lag, a.cd AS cd, b.cd AS cd_lag
        |  FROM centered a
        |  CROSS JOIN (SELECT CAST(r.range AS BIGINT) AS lag
        |              FROM range(1, 8) r) l
        |  JOIN centered b ON b.day + CAST(l.lag AS INTEGER) = a.day)
        |SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(CAST(sum(CAST(cd * cd_lag AS DECIMAL(38,8))) AS DOUBLE) /
        |    (SELECT CAST(ss AS DOUBLE) FROM denom), 6) AS acf
        |FROM pairs GROUP BY lag ORDER BY lag""".stripMargin,
  )
}
