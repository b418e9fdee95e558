package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics surface: scan/filter pushdown, aggregation, joins
  * (broadcast/shuffle/semi/anti), windows, top-k, rollup, set ops, and
  * event-time bucketing — the operator families SURVEY.md §2.2 lists as
  * engine-stance built-ins, exercised as driver-checkable queries.
  *
  * Money arithmetic is done in DECIMAL (exact, order-independent) and cast
  * to DOUBLE at the end so Spark and the DuckDB oracle agree bit-for-bit
  * regardless of aggregation order — summing raw doubles would diverge in
  * the low bits between engines at sf0.1+.
  */
object Analytics {
  import Tables.t

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Pricing summary (TPC-H Q1 shape): full-scan aggregate with partial
    // (map-side) aggregation; one shuffle on the 6-group key space.
    "q1_pricing_summary" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Selective filter + single scalar agg (TPC-H Q6 shape): predicates
    // push to the parquet scan; no join, one partial-agg reduce.
    "q2_revenue_filter" -> ((spark, dir) =>
      t(spark, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"))),

    // Broadcast dim join: orders ⋈ customer — customer is the small side at
    // any scale factor ratio, so it broadcasts (no shuffle of orders).
    "q3_segment_revenue" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // Multi-way join up the star: lineitem ⋈ orders (shuffle on orderkey at
    // scale) with customer/nation/region broadcast down the dim chain.
    "q4_nation_revenue" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
      val n = t(spark, dir, "nation")
      val r = t(spark, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("r_name", "n_name")
    }),

    // Top-k with deterministic tie-break: TakeOrderedAndProject, no full sort.
    "q5_topk_orders" -> ((spark, dir) =>
      t(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // Ranking + running-frame window per partition key.
    "q6_supplier_window" -> ((spark, dir) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(spark, dir, "lineitem")
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_quantity"),
          row_number().over(w).as("rn"),
          sum(col("l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_qty"))
        .filter(col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    }),

    // Semi join: customers that placed at least one 200k+ order.
    "q7_semi_join" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Anti join: customers with no orders at all.
    "q8_anti_join" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      val o = t(spark, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Distinct projection (shuffle dedup on a narrow key pair).
    "q9_distinct_flags" -> ((spark, dir) =>
      t(spark, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // Hierarchical aggregate: ROLLUP with grouping flags.
    "q10_rollup" -> ((spark, dir) =>
      t(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"))
        .orderBy(
          col("g_flag"), col("g_status"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // Event-time tumbling window (batch analogue of the streaming agg):
    // value summed via row-level round → decimal so engines agree exactly.
    "q11_events_hourly" -> ((spark, dir) =>
      t(spark, dir, "events")
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("hour_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("value"), 6).cast("decimal(18,6)"))
            .cast("double").as("sum_value"))
        .orderBy("hour_start", "event_type")),

    // Semi-structured extraction: JSON string column → typed value.
    "q12_json_extract" -> ((spark, dir) =>
      t(spark, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")),

    // Sessionization: gap-based (30 min) session assignment per user via
    // lag + running conditional sum — the standard scalable pattern (one
    // shuffle on user_id, no state explosion).
    "q13_sessionize" -> ((spark, dir) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val gapMin = 30L * 60
      // Fractional epoch seconds (cast to double), matching DuckDB's
      // epoch(ts): whole-second truncation would disagree with the oracle
      // for any gap in (1800, 1801) seconds.
      val newSession =
        when(col("ts").cast("double") - lag(col("ts"), 1).over(byUser).cast("double")
          > gapMin, 1).otherwise(0)
      t(spark, dir, "events")
        .withColumn("new_s", newSession)
        .withColumn("session_id",
          sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_revenue_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q3_segment_revenue" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q4_nation_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q5_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q6_supplier_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity, rn, running_qty
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity,
        |    row_number() OVER w AS rn,
        |    sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,

    "q7_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,

    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q9_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q11_events_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    "q12_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q13_sessionize" ->
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM (
        |  SELECT user_id, ts, event_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN epoch(ts) - epoch(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |           > 1800 THEN 1 ELSE 0 END AS new_s
        |    FROM events))
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
  )
}
