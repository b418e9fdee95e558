package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 80 (SURVEY.md §2.4):
  *
  *  - q233: order/line status consistency — the cross-table DQ rule a
  *    warehouse enforces between a header and its lines: an 'F' order
  *    should carry only 'F' lines, an 'O' order only 'O' lines, and
  *    'P' is the sanctioned mixed state. One co-partitioned join +
  *    per-order line-status census, then a one-row-per-header-status
  *    report of clean/violating orders with the dominant mix.
  *  - q234: month-arithmetic pins — the end-of-month clamping contract
  *    (Jan 31 + 1 month = Feb 28/29) and its 12-month stability,
  *    pinned over the real month-end dates in the data: add_months in
  *    the engine vs native INTERVAL arithmetic in DuckDB. A calendar
  *    library drifting on clamping flips rows loudly.
  */
object Analytics73 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q233_status_consistency" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val li = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linestatus"))
      val census = o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          count_if(col("l_linestatus") === "F").as("n_f"),
          count_if(col("l_linestatus") === "O").as("n_o"))
      census
        .withColumn("consistent",
          when(col("o_orderstatus") === "F", col("n_o") === 0)
            .when(col("o_orderstatus") === "O", col("n_f") === 0)
            .otherwise(col("n_f") > 0 && col("n_o") > 0))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          count_if(col("consistent")).as("n_consistent"),
          count_if(!col("consistent")).as("n_violations"),
          sum(col("n_lines")).as("n_lines_total"))
        .orderBy("o_orderstatus")
    }),

    "q234_month_arith_pins" -> ((spark, dir) => {
      val monthEnds = t(spark, dir, "orders")
        .select(to_date(col("o_orderdate")).as("d"))
        .filter(col("d") === last_day(col("d")))
        .select(last_day(col("d")).as("me"))
        .distinct()
      monthEnds
        .select(col("me"),
          add_months(col("me"), 1).as("plus1"),
          add_months(col("me"), 12).as("plus12"),
          (add_months(col("me"), 1) === last_day(add_months(col("me"), 1)))
            .as("plus1_is_month_end"),
          datediff(add_months(col("me"), 1), col("me")).as("gap_days"))
        .orderBy("me")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q233_status_consistency" ->
      """WITH census AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(count(*) FILTER (l_linestatus = 'F') AS BIGINT) AS n_f,
        |    CAST(count(*) FILTER (l_linestatus = 'O') AS BIGINT) AS n_o
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN o_orderstatus = 'F' THEN n_o = 0
        |      WHEN o_orderstatus = 'O' THEN n_f = 0
        |      ELSE n_f > 0 AND n_o > 0 END AS consistent
        |  FROM census)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(*) FILTER (consistent) AS BIGINT) AS n_consistent,
        |  CAST(count(*) FILTER (NOT consistent) AS BIGINT) AS n_violations,
        |  CAST(sum(n_lines) AS BIGINT) AS n_lines_total
        |FROM flagged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "q234_month_arith_pins" ->
      """WITH me AS (
        |  SELECT DISTINCT last_day(CAST(o_orderdate AS DATE)) AS me
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE)
        |    = last_day(CAST(o_orderdate AS DATE)))
        |SELECT me,
        |  CAST(me + INTERVAL 1 MONTH AS DATE) AS plus1,
        |  CAST(me + INTERVAL 12 MONTH AS DATE) AS plus12,
        |  CAST(me + INTERVAL 1 MONTH AS DATE)
        |    = last_day(CAST(me + INTERVAL 1 MONTH AS DATE))
        |    AS plus1_is_month_end,
        |  CAST(CAST(me + INTERVAL 1 MONTH AS DATE) - me AS INTEGER)
        |    AS gap_days
        |FROM me ORDER BY me""".stripMargin,
  )
}
