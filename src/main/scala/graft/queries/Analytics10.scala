package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 9 (SURVEY.md §2.4):
  *
  *  - q114: declarative constraint audit — the data-quality release gate
  *    next to q101's FK audit and q77's column profile: uniqueness,
  *    NOT NULL, domain, and range rules evaluated as ONE aggregation
  *    pass per table (count_if per rule — map-side combinable, no rule
  *    × table scan blowup), unpivoted to a (constraint, violations,
  *    passed) report. Composite uniqueness counts via distinct struct
  *    keys, never a self-join.
  *  - q115: sessionized engagement KPIs — q13's 30-minute-gap
  *    sessionization rolled up one level: per ENTRY event type, session
  *    counts, bounce rate (single-event sessions), and average duration.
  *    Entry/exit come from row_number over per-session windows (bounded
  *    partitions); per-session durations are rounded→DECIMAL before the
  *    cross-session sum, so the averages replay exactly.
  *  - q116: small-file compaction planner — the lakehouse maintenance
  *    job that bins a partition's files into target-size rewrite groups:
  *    cumulative bytes in (partition, file) order through ONE
  *    GlobalPrefixSum scan (the m8 recipe — per-partition bases come
  *    from a bounded groupBy, no per-partition single-task windows),
  *    batch = cumulative-end div target. File inventory is simulated
  *    from orders (exact integer cent sums as byte proxies).
  */
object Analytics10 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_constraint_audit" -> ((spark, dir) => {
      val o = t(spark, dir, "orders").agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_unique"),
        count_if(col("o_custkey").isNull).as("v_notnull"),
        count_if(!(col("o_totalprice") > 0)).as("v_range"),
        count_if(!col("o_orderstatus").isin("F", "O", "P")).as("v_domain"))
      val l = t(spark, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(
          struct(col("l_orderkey"), col("l_linenumber")))).as("v_unique"),
        count_if(!(col("l_quantity") >= 1 && col("l_quantity") <= 50))
          .as("v_qty"),
        count_if(!(to_date(col("l_shipdate")) >= lit("1992-01-01") &&
          to_date(col("l_shipdate")) <= lit("1998-12-31"))).as("v_date"))
      val c = t(spark, dir, "customer").agg(
        count(lit(1)).as("n"),
        count_if(!col("c_mktsegment").isin("AUTOMOBILE", "BUILDING",
          "FURNITURE", "HOUSEHOLD", "MACHINERY")).as("v_domain"))
      def row(src: DataFrame, table: String, name: String, vcol: String) =
        src.select(lit(s"$table.$name").as("constraint_name"),
          lit(table).as("table_name"), col("n").as("n_rows"),
          col(vcol).as("n_violations"), (col(vcol) === 0).as("passed"))
      row(o, "orders", "orderkey_unique", "v_unique")
        .unionByName(row(o, "orders", "custkey_not_null", "v_notnull"))
        .unionByName(row(o, "orders", "totalprice_positive", "v_range"))
        .unionByName(row(o, "orders", "status_domain", "v_domain"))
        .unionByName(row(l, "lineitem", "orderkey_linenumber_unique",
          "v_unique"))
        .unionByName(row(l, "lineitem", "quantity_1_50", "v_qty"))
        .unionByName(row(l, "lineitem", "shipdate_in_range", "v_date"))
        .unionByName(row(c, "customer", "mktsegment_domain", "v_domain"))
        .orderBy("constraint_name")
    }),

    "q116_compaction_plan" -> ((spark, dir) => {
      val target = 50000000000L
      val files = t(spark, dir, "orders")
        .groupBy(col("o_orderpriority").as("part"),
          (col("o_orderkey") % 40).as("file_id"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("bytes"))
      val cum = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        files, struct(col("part"), col("file_id")), "bytes", "cum")
      val bases = cum.groupBy("part")
        .agg(min(col("cum") - col("bytes")).as("base"))
      cum.join(broadcast(bases), Seq("part"))
        .withColumn("batch_id", expr(s"(cum - base - 1) div $target"))
        .groupBy("part", "batch_id")
        .agg(count(lit(1)).as("n_files"), sum("bytes").as("batch_bytes"),
          min("file_id").as("first_file"), max("file_id").as("last_file"))
        .orderBy("part", "batch_id")
    }),

    "q115_session_kpis" -> ((spark, dir) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val gapMin = 30L * 60
      val newSession =
        when(col("ts").cast("double") -
          lag(col("ts"), 1).over(byUser).cast("double") > gapMin, 1)
          .otherwise(0)
      val sessions = t(spark, dir, "events")
        .withColumn("new_s", newSession)
        .withColumn("session_id",
          sum(col("new_s")).over(byUser.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
      val bySession = Window.partitionBy("user_id", "session_id")
        .orderBy(col("ts"), col("event_id"))
      val perSession = sessions
        .withColumn("rn", row_number().over(bySession))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          max(when(col("rn") === 1, col("event_type"))).as("entry_type"),
          (max(col("ts").cast("double")) - min(col("ts").cast("double")))
            .as("dur_s"))
      perSession
        .withColumn("dur_d", round(col("dur_s"), 6).cast("decimal(18,6)"))
        .groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          count_if(col("n_events") === 1).as("n_bounces"),
          sum("dur_d").as("dur_sum"))
        .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
          round(col("n_bounces").cast("double") / col("n_sessions"), 6)
            .as("bounce_rate"),
          round(col("dur_sum").cast("double") / col("n_sessions"), 3)
            .as("avg_duration_s"))
        .orderBy("entry_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q114_constraint_audit" ->
      """WITH o AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |      AS v_unique,
        |    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
        |      AS v_notnull,
        |    CAST(count(*) FILTER (WHERE NOT (o_totalprice > 0)) AS BIGINT)
        |      AS v_range,
        |    CAST(count(*) FILTER (WHERE o_orderstatus NOT IN
        |      ('F', 'O', 'P')) AS BIGINT) AS v_domain
        |  FROM orders),
        |l AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS BIGINT) AS v_unique,
        |    CAST(count(*) FILTER (WHERE NOT (l_quantity >= 1
        |      AND l_quantity <= 50)) AS BIGINT) AS v_qty,
        |    CAST(count(*) FILTER (WHERE NOT (
        |      CAST(l_shipdate AS DATE) >= DATE '1992-01-01'
        |      AND CAST(l_shipdate AS DATE) <= DATE '1998-12-31'))
        |      AS BIGINT) AS v_date
        |  FROM lineitem),
        |c AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (WHERE c_mktsegment NOT IN ('AUTOMOBILE',
        |      'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY'))
        |      AS BIGINT) AS v_domain
        |  FROM customer)
        |SELECT * FROM (
        |  SELECT 'orders.orderkey_unique' AS constraint_name,
        |    'orders' AS table_name, n AS n_rows,
        |    v_unique AS n_violations, v_unique = 0 AS passed FROM o
        |  UNION ALL SELECT 'orders.custkey_not_null', 'orders', n,
        |    v_notnull, v_notnull = 0 FROM o
        |  UNION ALL SELECT 'orders.totalprice_positive', 'orders', n,
        |    v_range, v_range = 0 FROM o
        |  UNION ALL SELECT 'orders.status_domain', 'orders', n,
        |    v_domain, v_domain = 0 FROM o
        |  UNION ALL SELECT 'lineitem.orderkey_linenumber_unique',
        |    'lineitem', n, v_unique, v_unique = 0 FROM l
        |  UNION ALL SELECT 'lineitem.quantity_1_50', 'lineitem', n,
        |    v_qty, v_qty = 0 FROM l
        |  UNION ALL SELECT 'lineitem.shipdate_in_range', 'lineitem', n,
        |    v_date, v_date = 0 FROM l
        |  UNION ALL SELECT 'customer.mktsegment_domain', 'customer', n,
        |    v_domain, v_domain = 0 FROM c)
        |ORDER BY constraint_name""".stripMargin,

    "q116_compaction_plan" ->
      """WITH files AS (
        |  SELECT o_orderpriority AS part, o_orderkey % 40 AS file_id,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(38,2)) * 100 AS BIGINT) AS bytes
        |  FROM orders GROUP BY 1, 2),
        |c AS (
        |  SELECT part, file_id, bytes,
        |    sum(bytes) OVER (PARTITION BY part ORDER BY file_id) AS cum
        |  FROM files)
        |SELECT part, CAST((cum - 1) // 50000000000 AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS batch_bytes,
        |  min(file_id) AS first_file, max(file_id) AS last_file
        |FROM c GROUP BY part, (cum - 1) // 50000000000
        |ORDER BY part, batch_id""".stripMargin,

    "q115_session_kpis" ->
      """WITH s AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) > 1800
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |ses AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM s),
        |rn AS (
        |  SELECT user_id, session_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id, session_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM ses),
        |per AS (
        |  SELECT user_id, session_id,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    max(CASE WHEN rn = 1 THEN event_type END) AS entry_type,
        |    CAST(round(max(epoch(ts)) - min(epoch(ts)), 6)
        |      AS DECIMAL(18,6)) AS dur_d
        |  FROM rn GROUP BY user_id, session_id)
        |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT)
        |    AS n_bounces,
        |  round(CAST(count(*) FILTER (WHERE n_events = 1) AS DOUBLE)
        |    / count(*), 6) AS bounce_rate,
        |  round(CAST(sum(dur_d) AS DOUBLE) / count(*), 3)
        |    AS avg_duration_s
        |FROM per GROUP BY entry_type
        |ORDER BY entry_type""".stripMargin,
  )
}
