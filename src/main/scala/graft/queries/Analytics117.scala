package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 136 (SURVEY.md §2.4 robust statistics):
  *
  *  - q309: Huber M-estimator of location via three IRLS iterations —
  *    the robust mean that downweights (rather than discards, like
  *    winsorizing/q252) outliers. Every iteration is one full-scan
  *    aggregate with the running estimate broadcast as a one-row
  *    frame; determinism comes from the round-once discipline: the
  *    estimate and tuning constant are DECIMAL(18,6) scalars, weights
  *    round to DECIMAL(9,6) per row, so Σw·x and Σw are exact
  *    decimals in both engines. Fixed iteration count (3) keeps the
  *    plan static — no driver-side convergence loop.
  *
  *  - q310: half-sample bootstrap CI for the mean order total — 32
  *    deterministic replicates (membership = md5 parity of
  *    (replicate, orderkey)), replicate means rounded once to
  *    DECIMAL(18,6), their spread scaled by the half-sample
  *    correction √(m/(n−m)) ≈ 1 into a standard error. The explode
  *    is a 32× row blowup that map-side combines straight back down
  *    to 32 groups per task — the honest distributed-bootstrap shape.
  */
object Analytics117 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q309_huber_mean" -> ((spark, dir) => {
      val x = t(spark, dir, "orders")
        .select(expr("cast(round(o_totalprice, 2) as decimal(18,2))")
          .as("x"))
      // exact first/second moments → mean + std → c = 1.345·s, all
      // rounded once into decimal scalars
      val m0 = x.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("cast(x * x as decimal(38,4))")).as("sxx"))
        .selectExpr("n",
          "cast(round(cast(sx as double) / n, 6) as decimal(18,6)) as m",
          """cast(round(1.345d * sqrt((cast(sxx as double)
            |  - n * (cast(sx as double) / n) * (cast(sx as double) / n))
            |  / (n - 1)), 6) as decimal(18,6)) as c""".stripMargin)
      def step(prev: DataFrame): DataFrame =
        x.crossJoin(broadcast(prev))
          .select(col("n"), col("c"),
            expr("""cast(round(least(1.0d, cast(c as double)
                   |  / greatest(abs(cast(x as double) - cast(m as double)),
                   |             1e-9d)), 6) as decimal(9,6))"""
              .stripMargin).as("w"),
            col("x"))
          .groupBy("n", "c")
          .agg(sum(expr("cast(w * x as decimal(38,8))")).as("swx"),
            sum(col("w")).as("sw"))
          .selectExpr("n", "c",
            """cast(round(cast(swx as double) / cast(sw as double), 6)
              |  as decimal(18,6)) as m""".stripMargin)
      val m3 = step(step(step(m0)))
      m3.crossJoin(broadcast(m0.selectExpr(
          "cast(m as double) as plain_mean")))
        .selectExpr("n", "cast(c as double) as huber_c",
          "plain_mean", "cast(m as double) as huber_mean")
    }),

    "q310_half_sample_ci" -> ((spark, dir) => {
      val x = t(spark, dir, "orders")
        .select(col("o_orderkey"),
          expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("x"))
      val reps = x.select(col("o_orderkey"), col("x"),
          explode(sequence(lit(0), lit(31))).as("r"))
        .filter(graft.functions.Md5Pack(
          concat(lit("bs"), col("r").cast("string"), lit("_"),
            col("o_orderkey").cast("string"))) % 2 === 0)
      val mu = reps.groupBy("r").agg(
          count(lit(1)).as("m"), sum(col("x")).as("sx"))
        .select(expr(
          """cast(round(cast(sx as double) / m, 6) as decimal(18,6))"""
        ).as("mu"))
      val spread = mu.agg(count(lit(1)).as("b"), sum(col("mu")).as("smu"),
        sum(expr("cast(mu * mu as decimal(38,12))")).as("smumu"))
      val overall = x.agg(count(lit(1)).as("n"), sum(col("x")).as("sxa"))
      spread.crossJoin(broadcast(overall)).selectExpr("n", "b",
          "round(cast(sxa as double) / n, 6) as mean",
          """round(sqrt((cast(smumu as double)
            |  - b * (cast(smu as double) / b) * (cast(smu as double) / b))
            |  / (b - 1)), 6) as hs_std""".stripMargin)
        .selectExpr("n", "b", "mean", "hs_std",
          "round(mean - 1.96d * hs_std, 6) as ci_lo",
          "round(mean + 1.96d * hs_std, 6) as ci_hi")
    }),
  )

  private def huberIterSql(prev: String, k: Int): String =
    s"""it$k AS (
       |  SELECT n, c,
       |    CAST(round(CAST(sum(CAST(w * x AS DECIMAL(38,8))) AS DOUBLE)
       |      / CAST(sum(w) AS DOUBLE), 6) AS DECIMAL(18,6)) AS m
       |  FROM (
       |    SELECT n, c, x,
       |      CAST(round(least(1.0, CAST(c AS DOUBLE)
       |        / greatest(abs(CAST(x AS DOUBLE) - CAST(m AS DOUBLE)),
       |                   1e-9)), 6) AS DECIMAL(9,6)) AS w
       |    FROM x CROSS JOIN $prev) t
       |  GROUP BY n, c)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q309_huber_mean" -> s"""
      WITH x AS (
        SELECT CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS x
        FROM orders),
      m0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(round(CAST(sum(x) AS DOUBLE) / count(*), 6)
            AS DECIMAL(18,6)) AS m,
          CAST(round(1.345 * sqrt((CAST(sum(CAST(x * x AS DECIMAL(38,4)))
              AS DOUBLE)
            - count(*) * (CAST(sum(x) AS DOUBLE) / count(*))
              * (CAST(sum(x) AS DOUBLE) / count(*))) / (count(*) - 1)), 6)
            AS DECIMAL(18,6)) AS c
        FROM x),
      ${huberIterSql("m0", 1)},
      ${huberIterSql("it1", 2)},
      ${huberIterSql("it2", 3)}
      SELECT n, CAST(c AS DOUBLE) AS huber_c,
        (SELECT CAST(m AS DOUBLE) FROM m0) AS plain_mean,
        CAST(m AS DOUBLE) AS huber_mean
      FROM it3""",

    "q310_half_sample_ci" -> s"""
      WITH x AS (
        SELECT o_orderkey,
          CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS x
        FROM orders),
      reps AS (
        SELECT x, r FROM x
        CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS r) rs
        WHERE ${Tables.duckMd5Pack(
          "'bs' || CAST(r AS VARCHAR) || '_' || CAST(o_orderkey AS VARCHAR)")}
          % 2 = 0),
      mu AS (
        SELECT CAST(round(CAST(sum(x) AS DOUBLE) / count(*), 6)
          AS DECIMAL(18,6)) AS mu
        FROM reps GROUP BY r),
      spread AS (
        SELECT CAST(count(*) AS BIGINT) AS b, sum(mu) AS smu,
          sum(CAST(CAST(mu AS DECIMAL(28,6)) * mu AS DECIMAL(38,12)))
            AS smumu
        FROM mu),
      overall AS (
        SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sxa FROM x),
      o AS (
        SELECT n, b,
          round(CAST(sxa AS DOUBLE) / n, 6) AS mean,
          round(sqrt((CAST(smumu AS DOUBLE)
            - b * (CAST(smu AS DOUBLE) / b) * (CAST(smu AS DOUBLE) / b))
            / (b - 1)), 6) AS hs_std
        FROM spread CROSS JOIN overall)
      SELECT n, b, mean, hs_std,
        round(mean - 1.96 * hs_std, 6) AS ci_lo,
        round(mean + 1.96 * hs_std, 6) AS ci_hi
      FROM o""",
  )
}
