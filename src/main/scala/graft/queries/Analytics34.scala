package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 38 (SURVEY.md §2.4):
  *
  *  - q159: per-group exact quartiles at scale — fulfillment latency
  *    Q1/median/Q3 per order priority WITHOUT a per-group sort window
  *    (5 priority partitions would mean 5 tasks sorting the whole fact
  *    table). One GlobalPrefixSum scan over the composite
  *    (priority, days, tiebreak) order gives global dense ranks;
  *    subtracting each group's broadcast starting offset converts them
  *    to within-group ranks (the m8 dense-index recipe); the three
  *    target ranks per group join back on integer equality. Exact
  *    order statistics, zero single-task stages, any group count.
  *  - q160: revenue reconciliation — the ledger-audit pattern: the same
  *    monthly revenue derived two independent ways (order headers vs
  *    line items) full-outer aligned, with mismatch counts and exact-
  *    cents drift totals. On synthetic data the two books genuinely
  *    disagree — which is the point: the report quantifies it, in
  *    DECIMAL end to end.
  */
object Analytics34 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_latency_quartiles" -> ((spark, dir) => {
      val lastShip = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
      val days = t(spark, dir, "orders")
        .join(lastShip, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
          datediff(col("last_ship"), to_date(col("o_orderdate")))
            .cast("long").as("days"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        days.withColumn("one", lit(1L)),
        struct(col("prio").as("p"), col("days").as("d"),
          col("o_orderkey").as("k")), "one", "grank")
      // group offsets: one row per priority — broadcast back
      val sizes = days.groupBy(col("prio")).agg(count(lit(1)).as("n_g"))
      val wOff = org.apache.spark.sql.expressions.Window.orderBy("prio")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val offsets = sizes
        .withColumn("off", coalesce(sum(col("n_g")).over(wOff), lit(0L)))
      val targets = offsets.select(col("prio").as("t_prio"), col("off"),
          col("n_g"),
          explode(expr(
            """array(
              |  named_struct('q', 'q1', 'tr', (n_g - 1) div 4 + 1),
              |  named_struct('q', 'median', 'tr', (n_g - 1) div 2 + 1),
              |  named_struct('q', 'q3', 'tr', (3 * (n_g - 1)) div 4 + 1)
              |)""".stripMargin)).as("t"))
        .select(col("t_prio"), col("off"), col("n_g"),
          col("t.q").as("quartile"), col("t.tr").as("target_rank"))
      ranked.join(broadcast(targets),
          col("prio") === col("t_prio") &&
            col("grank") - col("off") === col("target_rank"))
        .select(col("prio").as("o_orderpriority"), col("quartile"),
          col("n_g").as("n_orders"), col("days"))
        .orderBy("o_orderpriority", "quartile")
    }),

    "q160_revenue_reconciliation" -> ((spark, dir) => {
      val headers = t(spark, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m1"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("decimal(38,0)").as("header_cents"))
      val lines = t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("month", col("o_orderdate")).as("m2"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("decimal(38,0)").as("line_cents"))
      headers.join(lines, col("m1") === col("m2"), "full_outer")
        .select(
          coalesce(col("header_cents"), lit(0).cast("decimal(38,0)"))
            .as("h"),
          coalesce(col("line_cents"), lit(0).cast("decimal(38,0)"))
            .as("l"))
        .agg(count(lit(1)).as("n_months"),
          count_if(col("h") === col("l")).as("n_matched"),
          max(abs(col("h") - col("l"))).cast("long")
            .as("max_abs_diff_cents"),
          sum(col("h") - col("l")).cast("long")
            .as("total_diff_cents"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q159_latency_quartiles" ->
      """WITH last_ship AS (
        |  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
        |  FROM lineitem GROUP BY 1),
        |days AS (
        |  SELECT o_orderpriority AS prio, o_orderkey,
        |    date_diff('day', CAST(o_orderdate AS DATE), last_ship)
        |      AS days
        |  FROM orders JOIN last_ship ON o_orderkey = l_orderkey),
        |rk AS (
        |  SELECT prio, days,
        |    row_number() OVER (PARTITION BY prio
        |      ORDER BY days, o_orderkey) AS grank,
        |    CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n_g
        |  FROM days),
        |t AS (
        |  SELECT prio, days, grank, n_g FROM rk),
        |sel AS (
        |  SELECT prio AS o_orderpriority, 'q1' AS quartile,
        |    n_g AS n_orders, days
        |  FROM t WHERE grank = (n_g - 1) // 4 + 1
        |  UNION ALL
        |  SELECT prio, 'median', n_g, days
        |  FROM t WHERE grank = (n_g - 1) // 2 + 1
        |  UNION ALL
        |  SELECT prio, 'q3', n_g, days
        |  FROM t WHERE grank = (3 * (n_g - 1)) // 4 + 1)
        |SELECT o_orderpriority, quartile, n_orders, days
        |FROM sel ORDER BY o_orderpriority, quartile""".stripMargin,

    "q160_revenue_reconciliation" ->
      """WITH headers AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS header_cents
        |  FROM orders GROUP BY 1),
        |lines AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS line_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1),
        |j AS (
        |  SELECT
        |    coalesce(header_cents, CAST(0 AS DECIMAL(38,0))) AS h,
        |    coalesce(line_cents, CAST(0 AS DECIMAL(38,0))) AS l
        |  FROM headers FULL OUTER JOIN lines USING (m))
        |SELECT CAST(count(*) AS BIGINT) AS n_months,
        |  CAST(count(*) FILTER (WHERE h = l) AS BIGINT) AS n_matched,
        |  CAST(max(abs(h - l)) AS BIGINT) AS max_abs_diff_cents,
        |  CAST(sum(h - l) AS BIGINT) AS total_diff_cents
        |FROM j""".stripMargin,
  )
}
