package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 30 (SURVEY.md §2.4) — order-lifecycle KPIs:
  *
  *  - q149: fulfillment cycle time — days from order placement to the
  *    LAST line shipment, rolled up by priority. The per-order max and
  *    the order join both shuffle on l_orderkey/o_orderkey (one
  *    co-partitioned exchange pair); day arithmetic stays integer (both
  *    engines count date boundaries after an explicit DATE cast), so
  *    only the final mean divides in float with identical association.
  *  - q150: repeat-purchase interval — per returning customer the mean
  *    gap between first and last order, averaged by market segment.
  *    Per-customer gaps are exact integers; each customer's mean gap
  *    rounds →DECIMAL(18,6) BEFORE the segment re-aggregation (float
  *    sum order across partitions is not guaranteed — the jackknife
  *    q112 rule), so the segment sum is exact and the final division is
  *    one float op.
  */
object Analytics27 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_cycle_time" -> ((spark, dir) => {
      val lastShip = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
      t(spark, dir, "orders")
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("last_ship"), to_date(col("o_orderdate")))
            .as("days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("days")).as("sum_days"),
          max(col("days")).as("max_days"))
        .select(col("o_orderpriority"), col("n_orders"),
          round(col("sum_days").cast("double") /
            col("n_orders").cast("double"), 6).as("avg_days"),
          col("max_days"))
        .orderBy("o_orderpriority")
    }),

    "q150_repeat_interval" -> ((spark, dir) => {
      val perCust = t(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          min(to_date(col("o_orderdate"))).as("first_o"),
          max(to_date(col("o_orderdate"))).as("last_o"))
        .filter(col("n_orders") >= 2)
        .select(col("o_custkey"),
          round(datediff(col("last_o"), col("first_o"))
            .cast("double") / (col("n_orders") - 1).cast("double"), 6)
            .cast("decimal(18,6)").as("avg_gap"))
      perCust
        .join(t(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_repeat_cust"),
          sum(col("avg_gap")).cast("decimal(38,6)").as("sum_gap"))
        .select(col("c_mktsegment"), col("n_repeat_cust"),
          round(col("sum_gap").cast("double") /
            col("n_repeat_cust").cast("double"), 6)
            .as("avg_interval_days"))
        .orderBy("c_mktsegment")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q149_cycle_time" ->
      """WITH last_ship AS (
        |  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderpriority,
        |    date_diff('day', CAST(o_orderdate AS DATE), last_ship)
        |      AS days
        |  FROM orders JOIN last_ship ON o_orderkey = l_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(days) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS avg_days,
        |  CAST(max(days) AS INT) AS max_days
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q150_repeat_interval" ->
      """WITH per_cust AS (
        |  SELECT o_custkey,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    min(CAST(o_orderdate AS DATE)) AS first_o,
        |    max(CAST(o_orderdate AS DATE)) AS last_o
        |  FROM orders GROUP BY 1),
        |gaps AS (
        |  SELECT o_custkey,
        |    CAST(round(CAST(date_diff('day', first_o, last_o) AS DOUBLE)
        |      / CAST(n_orders - 1 AS DOUBLE), 6) AS DECIMAL(18,6))
        |      AS avg_gap
        |  FROM per_cust WHERE n_orders >= 2)
        |SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_repeat_cust,
        |  round(CAST(CAST(sum(avg_gap) AS DECIMAL(38,6)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS avg_interval_days
        |FROM gaps JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
