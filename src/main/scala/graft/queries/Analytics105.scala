package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 122 (SURVEY.md §2.4):
  *
  *  - q285: process-mining conformance audit — each user's event trace
  *    (one initial per event, (ts, event_id)-ordered) is checked
  *    against the reference process "signup, then purchase, with no
  *    error in between": classes NO_PURCHASE / NO_SIGNUP_BEFORE /
  *    ERROR_BLOCKED / CONFORMANT derive from exact first-occurrence
  *    positions (instr arithmetic, no regex dialect risk). Traces
  *    aggregate per user (bounded partitions), classes per corpus.
  *  - q286: watermark lateness audit — how out-of-order is the event
  *    stream in ARRIVAL order (event_id)? The running high-watermark
  *    max(ts) rides [[graft.operators.GlobalPrefixSum.withRunningMax]]
  *    (two-phase scan, never a single-task global window); each
  *    event's lateness is watermark − ts, and the p99 lateness — the
  *    number a streaming `withWatermark` delay should exceed — comes
  *    from the bounded minute-bucket histogram (the q283 covering-
  *    bucket discipline).
  */
object Analytics105 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q285_conformance" -> ((spark, dir) => {
      val traces = Tables.events(spark, dir)
        .groupBy("user_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("ini")))),
          x => x("ini")), "").as("trace"))
      val p0 = instr(col("trace"), "p")
      val s0 = instr(col("trace"), "s")
      val classed = traces.select(col("user_id"), col("trace"),
        when(p0 === 0, "no_purchase")
          .when(s0 === 0 || s0 > p0, "no_signup_before")
          .when(instr(substring(col("trace"), s0.cast("int"),
            (p0 - s0).cast("int")), "e") > 0, "error_blocked")
          .otherwise("conformant").as("class"))
      classed.groupBy("class")
        .agg(count(lit(1)).as("n_users"),
          round(avg(length(col("trace"))), 6).as("avg_trace_len"))
        .crossJoin(broadcast(classed.agg(count(lit(1)).as("nu"))))
        .select(col("class"), col("n_users"),
          round(col("n_users").cast("double") / col("nu"), 6).as("share"),
          col("avg_trace_len"))
        .orderBy("class")
    }),

    "q286_watermark_audit" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("tsm"))
      val run = graft.operators.GlobalPrefixSum
        .withRunningMax(ev, "event_id", "tsm", "wm")
        .select((col("wm") - col("tsm")).as("late_us"))
      val hist = run
        .select(expr("late_us div 60000000").as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.orderBy("b")))
        .crossJoin(broadcast(run.agg(count(lit(1)).as("n"),
          count_if(col("late_us") > 0).as("n_late"),
          max(col("late_us")).as("max_late_us"))))
      // Minute-bucket frame is bounded by the stream's lateness range —
      // SF-independent — so the ordering window is a tiny sort.
      cum.filter(col("cum") >= expr("(n * 99 + 99) div 100"))
        .agg(graft.functions.TopKAgg.minK(
          struct(col("b"), col("n"), col("n_late"), col("max_late_us")), 1)
          .as("w"))
        .select(col("w")(0)("n").as("n_events"),
          col("w")(0)("n_late").as("n_late"),
          round(col("w")(0)("n_late").cast("double") / col("w")(0)("n"), 6)
            .as("share_late"),
          expr("w[0].max_late_us div 1000000").as("max_late_seconds"),
          col("w")(0)("b").as("p99_late_minutes"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q285_conformance" -> """
      WITH traces AS (
        SELECT user_id,
          string_agg(substring(event_type, 1, 1), ''
            ORDER BY ts, event_id) AS trace
        FROM events GROUP BY user_id),
      classed AS (
        SELECT user_id, trace,
          CASE
            WHEN strpos(trace, 'p') = 0 THEN 'no_purchase'
            WHEN strpos(trace, 's') = 0
              OR strpos(trace, 's') > strpos(trace, 'p')
              THEN 'no_signup_before'
            WHEN strpos(substring(trace, strpos(trace, 's'),
              strpos(trace, 'p') - strpos(trace, 's')), 'e') > 0
              THEN 'error_blocked'
            ELSE 'conformant' END AS class
        FROM traces),
      nu AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM classed)
      SELECT class, CAST(count(*) AS BIGINT) AS n_users,
        round(CAST(count(*) AS DOUBLE) / nu, 6) AS share,
        round(avg(length(trace)), 6) AS avg_trace_len
      FROM classed, nu
      GROUP BY class, nu
      ORDER BY class""",

    "q286_watermark_audit" -> """
      WITH ev AS (
        SELECT event_id, epoch_us(ts) AS tsm FROM events),
      run AS (
        SELECT max(tsm) OVER (ORDER BY event_id) - tsm AS late_us
        FROM ev),
      agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) FILTER (WHERE late_us > 0) AS BIGINT) AS n_late,
          CAST(max(late_us) AS BIGINT) AS max_late_us
        FROM run),
      hist AS (
        SELECT late_us // 60000000 AS b, CAST(count(*) AS BIGINT) AS c
        FROM run GROUP BY 1),
      cum AS (
        SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum
        FROM hist),
      p99 AS (
        SELECT b FROM cum, agg
        WHERE cum >= (n * 99 + 99) // 100
        ORDER BY b LIMIT 1)
      SELECT n AS n_events, n_late,
        round(CAST(n_late AS DOUBLE) / n, 6) AS share_late,
        max_late_us // 1000000 AS max_late_seconds,
        b AS p99_late_minutes
      FROM agg, p99""",
  )
}
