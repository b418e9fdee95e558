package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 82 (SURVEY.md §2.4):
  *
  *  - q236: seasonality-adjusted anomaly days — the alerting query
  *    behind ops dashboards: daily order counts divided by their
  *    day-of-week index (so Mondays compare to Mondays), then z-scored
  *    against the adjusted distribution and flagged at |z| > 2. The
  *    determinism recipe: the adjusted value pins to 6dp DECIMAL per
  *    day (one float division from exact integer counts), the moments
  *    accumulate in exact DECIMAL, and the final z is one double
  *    expression per day replayed identically by the oracle. Shapes:
  *    two groupBys on the bounded day/dow grids, one broadcast join.
  */
object Analytics75 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q236_seasonal_anomalies" -> ((spark, dir) => {
      val daily = t(spark, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("c"))
        .withColumn("dow", (((dayofweek(col("d")) + 5) % 7) + 1))
      val dowIdx = daily.groupBy("dow")
        .agg(sum(col("c")).as("s_w"), count(lit(1)).as("n_w"))
      val tot = daily.agg(sum(col("c")).as("t"), count(lit(1)).as("n"))
      // adjusted = c * (T/N) / (S_w/n_w), pinned to 6dp — exact integer
      // inputs, ONE float op, then decimal for every cross-row sum
      val adj = daily.join(broadcast(dowIdx), "dow")
        .crossJoin(broadcast(tot))
        .withColumn("adj",
          round(col("c").cast("double") * col("t").cast("double")
            * col("n_w").cast("double")
            / (col("n").cast("double") * col("s_w").cast("double")), 6)
            .cast("decimal(18,6)"))
      val m = adj.agg(
        count(lit(1)).cast("decimal(18,0)").as("nn"),
        sum(col("adj")).cast("decimal(38,6)").as("sa"),
        sum((col("adj") * col("adj")).cast("decimal(38,12)"))
          .cast("decimal(38,12)").as("saa"))
      adj.crossJoin(broadcast(m))
        .withColumn("z",
          round((col("adj").cast("double")
            - col("sa").cast("double") / col("nn").cast("double"))
            / sqrt(col("saa").cast("double") / col("nn").cast("double")
              - (col("sa").cast("double") / col("nn").cast("double"))
                * (col("sa").cast("double") / col("nn").cast("double"))), 4))
        .filter(abs(col("z")) > 2)
        .select(col("d"), col("c"), col("dow"),
          col("adj").cast("double").as("adj"), col("z"))
        .orderBy("d")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q236_seasonal_anomalies" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |dd AS (SELECT d, c, CAST(isodow(d) AS INTEGER) AS dow FROM daily),
        |dw AS (
        |  SELECT dow, CAST(sum(c) AS BIGINT) AS s_w,
        |    CAST(count(*) AS BIGINT) AS n_w
        |  FROM dd GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t,
        |  CAST(count(*) AS BIGINT) AS n FROM dd),
        |adj AS (
        |  SELECT d, c, dow,
        |    CAST(round(CAST(c AS DOUBLE) * CAST(t AS DOUBLE)
        |      * CAST(n_w AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(s_w AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS adj
        |  FROM dd JOIN dw USING (dow) CROSS JOIN tot),
        |m AS (
        |  SELECT CAST(count(*) AS DECIMAL(18,0)) AS nn,
        |    CAST(sum(adj) AS DECIMAL(38,6)) AS sa,
        |    CAST(sum(CAST(adj * adj AS DECIMAL(38,12))) AS DECIMAL(38,12))
        |      AS saa
        |  FROM adj)
        |SELECT d, c, dow, CAST(adj AS DOUBLE) AS adj,
        |  round((CAST(adj AS DOUBLE)
        |    - CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / sqrt(CAST(saa AS DOUBLE) / CAST(nn AS DOUBLE)
        |      - (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))), 4) AS z
        |FROM adj CROSS JOIN m
        |WHERE abs(round((CAST(adj AS DOUBLE)
        |    - CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / sqrt(CAST(saa AS DOUBLE) / CAST(nn AS DOUBLE)
        |      - (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))
        |        * (CAST(sa AS DOUBLE) / CAST(nn AS DOUBLE))), 4)) > 2
        |ORDER BY d""".stripMargin,
  )
}
