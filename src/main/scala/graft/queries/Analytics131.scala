package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 157 (SURVEY.md §2.4 survey sampling):
  *
  *  - q335: Horvitz–Thompson estimation under probability-
  *    proportional-to-size sampling — inclusion probability p_i ∝
  *    order quantity (integer cents, floor-div parts-per-billion),
  *    membership decided by md5 hash against the exact integer
  *    threshold, estimator Σ y_i/p_i with per-term rounding into
  *    DECIMAL so the sums are exact. Reports the estimate against the
  *    true total — the unequal-probability backbone of audit
  *    sampling.
  *
  *  - q336: ratio estimation — a 10% hash sample estimates total
  *    revenue two ways: plain expansion (N/n_s) and the ratio
  *    estimator R̂·X using the fully-known auxiliary quantity total.
  *    The ratio estimator's error shrinks with the y–x correlation;
  *    both errors are reported.
  */
object Analytics131 {
  import Tables.t

  private def orderFeats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(expr("cast(round(l_quantity * 100, 0) as decimal(18,0))"))
        .as("xc"))
      .join(t(spark, dir, "orders").select(col("o_orderkey"),
        expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("y")),
        col("ok") === col("o_orderkey"))
      .select("ok", "xc", "y")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q335_horvitz_thompson" -> ((spark, dir) => {
      val f = orderFeats(spark, dir)
      val tot = f.agg(sum(col("xc")).as("xt"), sum(col("y")).as("yt"),
        count(lit(1)).as("nn"))
      // pure LONG arithmetic: a decimal dividend routes Spark's div
      // through doubles, which are inexact past 2^53 at this magnitude
      val p = f.crossJoin(broadcast(tot))
        .withColumn("p9", least(lit(1000000000L),
          expr("(cast(xc as bigint) * 1000000000000L) div cast(xt as bigint)")))
        .filter(graft.functions.Md5Pack(
          concat(lit("ht_"), col("ok").cast("string")))
          % 1000000000L < col("p9"))
      // term y_i/p_i as a floor-div integer (cents·1e7 / p9): rounded
      // rational doubles hit a 4-dp half-boundary across engines;
      // truncation loses < 1e-7 per term and is bit-deterministic
      p.select(col("yt"), col("nn"), expr(
          """(cast(y * 100 as bigint) * 10000000L) div p9"""
        ).as("term"))
        .groupBy("yt", "nn")
        .agg(count(lit(1)).as("n_sampled"), sum(col("term")).as("ht"))
        .selectExpr("nn as n_orders", "n_sampled",
          "round(cast(ht as double), 2) as ht_total",
          "cast(yt as double) as true_total",
          """round((cast(ht as double) - cast(yt as double))
            | / cast(yt as double) * 100.0d, 4) as err_pct""".stripMargin)
    }),

    "q336_ratio_estimator" -> ((spark, dir) => {
      val f = orderFeats(spark, dir)
      val tot = f.agg(sum(col("xc")).as("xt"), sum(col("y")).as("yt"),
        count(lit(1)).as("nn"))
      val s = f.filter(graft.functions.Md5Pack(
          concat(lit("rs_"), col("ok").cast("string"))) % 10 === 0)
        .agg(count(lit(1)).as("ns"), sum(col("xc")).as("xs"),
          sum(col("y")).as("ys"))
      s.crossJoin(broadcast(tot)).selectExpr("nn as n_orders", "ns",
        """round(cast(ys as double) * nn / ns, 2)
          | as expansion_total""".stripMargin,
        """round(cast(ys as double) / cast(xs as double)
          |  * cast(xt as double), 2) as ratio_total""".stripMargin,
        "cast(yt as double) as true_total",
        """round((cast(ys as double) * nn / ns - cast(yt as double))
          | / cast(yt as double) * 100.0d, 4)
          | as expansion_err_pct""".stripMargin,
        """round((cast(ys as double) / cast(xs as double)
          |   * cast(xt as double) - cast(yt as double))
          | / cast(yt as double) * 100.0d, 4)
          | as ratio_err_pct""".stripMargin)
    }),
  )

  private val FeatsSql = s"""
        SELECT ok, xc, y FROM (
          SELECT l_orderkey AS ok,
            sum(CAST(round(l_quantity * 100, 0) AS DECIMAL(18,0))) AS xc
          FROM lineitem GROUP BY l_orderkey) f
        JOIN (SELECT o_orderkey,
            CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS y
          FROM orders) o ON f.ok = o.o_orderkey"""

  val oracleSql: Map[String, String] = Map(
    "q335_horvitz_thompson" -> s"""
      WITH f AS ($FeatsSql),
      tot AS (
        SELECT CAST(sum(xc) AS BIGINT) AS xt, sum(y) AS yt,
          CAST(count(*) AS BIGINT) AS nn
        FROM f),
      p AS (
        SELECT y, yt, nn,
          least(1000000000,
            (CAST(xc AS BIGINT) * 1000000000000) // xt) AS p9
        FROM f CROSS JOIN tot
        WHERE ${Tables.duckMd5Pack("'ht_' || CAST(ok AS VARCHAR)")}
          % 1000000000
          < least(1000000000,
            (CAST(xc AS BIGINT) * 1000000000000) // xt)),
      agg AS (
        SELECT yt, nn, CAST(count(*) AS BIGINT) AS n_sampled,
          CAST(sum((CAST(y * 100 AS BIGINT) * 10000000) // p9)
            AS BIGINT) AS ht
        FROM p GROUP BY yt, nn)
      SELECT nn AS n_orders, n_sampled,
        round(CAST(ht AS DOUBLE), 2) AS ht_total,
        CAST(yt AS DOUBLE) AS true_total,
        round((CAST(ht AS DOUBLE) - CAST(yt AS DOUBLE))
          / CAST(yt AS DOUBLE) * 100.0, 4) AS err_pct
      FROM agg""",

    "q336_ratio_estimator" -> s"""
      WITH f AS ($FeatsSql),
      tot AS (
        SELECT CAST(sum(xc) AS BIGINT) AS xt, sum(y) AS yt,
          CAST(count(*) AS BIGINT) AS nn
        FROM f),
      s AS (
        SELECT CAST(count(*) AS BIGINT) AS ns,
          CAST(sum(xc) AS BIGINT) AS xs, sum(y) AS ys
        FROM f
        WHERE ${Tables.duckMd5Pack("'rs_' || CAST(ok AS VARCHAR)")}
          % 10 = 0)
      SELECT nn AS n_orders, ns,
        round(CAST(ys AS DOUBLE) * nn / ns, 2) AS expansion_total,
        round(CAST(ys AS DOUBLE) / CAST(xs AS DOUBLE)
          * CAST(xt AS DOUBLE), 2) AS ratio_total,
        CAST(yt AS DOUBLE) AS true_total,
        round((CAST(ys AS DOUBLE) * nn / ns - CAST(yt AS DOUBLE))
          / CAST(yt AS DOUBLE) * 100.0, 4) AS expansion_err_pct,
        round((CAST(ys AS DOUBLE) / CAST(xs AS DOUBLE)
            * CAST(xt AS DOUBLE) - CAST(yt AS DOUBLE))
          / CAST(yt AS DOUBLE) * 100.0, 4) AS ratio_err_pct
      FROM s CROSS JOIN tot""",
  )
}
