package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 35 (SURVEY.md §2.4):
  *
  *  - q155: RFM segmentation — the marketing workhorse: every customer
  *    scored 1–5 on recency, frequency, and monetary value, then
  *    counted by segment. Each dimension's quintile comes from a
  *    GlobalPrefixSum rank (range-partitioned; a global ntile window
  *    would single-task), mapped to a score by pure integer arithmetic
  *    ((rank−1)·5 div n + 1 — identical formula in both engines, no
  *    ntile semantics to match). Unique (metric, custkey) order keys
  *    make every rank — and therefore every score — deterministic.
  *  - q156: rolling-origin forecast backtest — the model-eval loop that
  *    grades naive vs seasonal-naive baselines on the daily revenue
  *    series: lag-1 and lag-7 predictions per day, MAE and bias in
  *    exact cents (lag inputs are exact DECIMAL; the division to
  *    cents-per-day happens once, in an identical float chain). The
  *    series frame is bounded by the calendar; the heavy work is the
  *    daily rollup.
  */
object Analytics31 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_rfm_segments" -> ((spark, dir) => {
      val maxd = t(spark, dir, "orders")
        .agg(max(to_date(col("o_orderdate"))).as("maxd"))
      val base = t(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_o"),
          count(lit(1)).as("freq"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)")).cast("decimal(38,0)").as("money"))
        .crossJoin(broadcast(maxd))
        .select(col("o_custkey"),
          datediff(col("maxd"), col("last_o")).cast("long").as("rec_days"),
          col("freq"), col("money"))
      // the three rank scans CHAIN (each consumes the previous result):
      // measured against the parallel-branch + custkey-join formulation,
      // chaining moves strictly fewer bytes — the rank columns ride the
      // next range exchange instead of paying three extra equi-join
      // shuffles. The nested plan tree stays bounded at three scans and
      // each scan's internal persist shields re-execution.
      def ranked(df: DataFrame, orderExpr: Column, outCol: String) =
        graft.operators.GlobalPrefixSum.withRunningTotalBy(
          df.withColumn("one", lit(1L)), orderExpr, "one", outCol)
          .drop("one")
      // recency: fewer days since last order = better (higher score)
      val r = ranked(base,
        struct((-col("rec_days")).as("s"), col("o_custkey").as("k")),
        "r_rank")
      val f = ranked(r,
        struct(col("freq").as("s"), col("o_custkey").as("k")), "f_rank")
      val m = ranked(f,
        struct(col("money").as("s"), col("o_custkey").as("k")), "m_rank")
      val n = base.agg(count(lit(1)).as("n_cust"))
      m.crossJoin(broadcast(n))
        .select(
          expr("((r_rank - 1) * 5) div n_cust + 1").as("r_score"),
          expr("((f_rank - 1) * 5) div n_cust + 1").as("f_score"),
          expr("((m_rank - 1) * 5) div n_cust + 1").as("m_score"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    }),

    "q156_forecast_backtest" -> ((spark, dir) => {
      val daily = t(spark, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("decimal(38,0)").as("rev"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      val lagged = daily
        .withColumn("p1", lag(col("rev"), 1).over(w))
        .withColumn("p7", lag(col("rev"), 7).over(w))
      def eval(pred: String, method: String) = lagged
        .filter(col(pred).isNotNull)
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("rev") - col(pred))).cast("decimal(38,0)")
            .as("abs_err"),
          sum(col("rev") - col(pred)).cast("decimal(38,0)").as("bias"))
        .select(lit(method).as("method"), col("n_days"),
          round(col("abs_err").cast("double") /
            col("n_days").cast("double"), 6).as("mae_cents"),
          round(col("bias").cast("double") /
            col("n_days").cast("double"), 6).as("bias_cents"))
      eval("p1", "naive_lag1").unionByName(eval("p7", "seasonal_lag7"))
        .orderBy("method")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q155_rfm_segments" ->
      """WITH maxd AS (
        |  SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
        |base AS (
        |  SELECT o_custkey,
        |    date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      (SELECT maxd FROM maxd)) AS rec_days,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS money
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT o_custkey,
        |    row_number() OVER (ORDER BY rec_days DESC, o_custkey)
        |      AS r_rank,
        |    row_number() OVER (ORDER BY freq, o_custkey) AS f_rank,
        |    row_number() OVER (ORDER BY money, o_custkey) AS m_rank,
        |    CAST(count(*) OVER () AS BIGINT) AS n_cust
        |  FROM base)
        |SELECT ((r_rank - 1) * 5) // n_cust + 1 AS r_score,
        |  ((f_rank - 1) * 5) // n_cust + 1 AS f_score,
        |  ((m_rank - 1) * 5) // n_cust + 1 AS m_score,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM rk GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q156_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS rev
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT rev,
        |    lag(rev, 1) OVER (ORDER BY d) AS p1,
        |    lag(rev, 7) OVER (ORDER BY d) AS p7
        |  FROM daily),
        |e1 AS (
        |  SELECT 'naive_lag1' AS method,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(abs(rev - p1)) AS DECIMAL(38,0)) AS abs_err,
        |    CAST(sum(rev - p1) AS DECIMAL(38,0)) AS bias
        |  FROM lagged WHERE p1 IS NOT NULL),
        |e7 AS (
        |  SELECT 'seasonal_lag7' AS method,
        |    CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(abs(rev - p7)) AS DECIMAL(38,0)) AS abs_err,
        |    CAST(sum(rev - p7) AS DECIMAL(38,0)) AS bias
        |  FROM lagged WHERE p7 IS NOT NULL),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e7)
        |SELECT method, n_days,
        |  round(CAST(abs_err AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS mae_cents,
        |  round(CAST(bias AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
        |    AS bias_cents
        |FROM u ORDER BY method""".stripMargin,
  )
}
