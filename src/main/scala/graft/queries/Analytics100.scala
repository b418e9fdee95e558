package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 117 (SURVEY.md §2.4):
  *
  *  - q276: sequential pattern mining (PrefixSpan-style support
  *    counting) — which event-type SUBSEQUENCES (gaps allowed) occur in
  *    how many users' timelines? Length-2 support needs only each
  *    user's first/last occurrence per type (a 5-row-per-user frame:
  *    a<b subsequence ⇔ first(a) < last(b)); length-3 anchors the
  *    middle type's occurrences between first(a) and last(c). Nothing
  *    ever materializes actual subsequences — the frames are
  *    users×|alphabet| bounded, the classic trick that keeps
  *    sequence-support counting linear at any corpus size.
  *  - q277: sequential probability ratio test (SPRT) — the streaming
  *    A/B stopping rule: walk the log-likelihood ratio over the
  *    even-keyed order stream (H1: p=0.55 vs H0: p=0.5 on the
  *    "totalprice above fixed threshold" Bernoulli), stop at the
  *    Wald boundaries ±ln(99). The running LLR is a
  *    [[graft.operators.GlobalPrefixSum]] scan (never a single-task
  *    window); the two log constants are rounded→DECIMAL once so
  *    every partial sum is exact, and the first boundary crossing is
  *    a bounded min-k argmin.
  */
object Analytics100 {
  import Tables.t

  /** Support threshold denominator: report patterns in ≥ 1/Frac users. */
  private val Frac = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q276_seq_patterns" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type").as("et"), col("ts"),
          col("event_id"))
      // Tie-safe event order: (ts, event_id) packed per type extremes.
      val spanByType = ev
        .groupBy("user_id", "et")
        .agg(min(struct(col("ts"), col("event_id"))).as("first_occ"),
          max(struct(col("ts"), col("event_id"))).as("last_occ"))
        .localCheckpoint(true) // reused by the L2 pair and L3 anchor joins
      val nUsers = ev.agg(countDistinct(col("user_id")).as("nu"))
      val l2 = spanByType.as("a")
        .join(spanByType.as("b"), col("a.user_id") === col("b.user_id"))
        .filter(col("a.first_occ") < col("b.last_occ")
          && col("a.et") =!= col("b.et"))
        .groupBy(col("a.et").as("e1"), col("b.et").as("e2"))
        .agg(countDistinct(col("a.user_id")).as("support"))
        .select(concat(col("e1"), lit(">"), col("e2")).as("pattern"),
          lit(2).as("len"), col("support"))
      // L3: a middle-type occurrence strictly inside (first(a), last(c)).
      val l3 = ev.as("m")
        .join(spanByType.as("a"), col("m.user_id") === col("a.user_id"))
        .join(spanByType.as("c"), col("m.user_id") === col("c.user_id"))
        .filter(col("a.et") =!= col("m.et") && col("c.et") =!= col("m.et")
          && col("a.et") =!= col("c.et")
          && col("a.first_occ") < struct(col("m.ts"), col("m.event_id"))
          && struct(col("m.ts"), col("m.event_id")) < col("c.last_occ"))
        .groupBy(col("a.et").as("e1"), col("m.et").as("e2"),
          col("c.et").as("e3"))
        .agg(countDistinct(col("m.user_id")).as("support"))
        .select(concat(col("e1"), lit(">"), col("e2"), lit(">"), col("e3"))
          .as("pattern"), lit(3).as("len"), col("support"))
      l2.union(l3)
        .crossJoin(broadcast(nUsers))
        .filter(col("support") * Frac >= col("nu"))
        .select(col("pattern"), col("len"), col("support"),
          round(col("support").cast("double") / col("nu"), 6).as("share"))
        .orderBy("len", "pattern")
    }),

    "q277_sprt" -> ((spark, dir) => {
      // LLR step constants for H1 p=0.55 vs H0 p=0.5, rounded→DECIMAL
      // once so every partial sum is exact and order-free.
      val obs = t(spark, dir, "orders")
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice") > 150000).as("x"))
        .withColumn("llr", expr(
          """cast(round(CASE WHEN x THEN ln(cast(0.55 as double) / 0.5)
            |  ELSE ln(cast(0.45 as double) / 0.5) END, 12)
            |  as decimal(28,12))""".stripMargin))
      // The row index is a UNIT prefix sum riding the same range scan
      // as the LLR — a row_number() over a global order would be the
      // single-task window trap.
      val walked = graft.operators.GlobalPrefixSum
        .withRunningTotalsBy(obs.withColumn("one", lit(1L)), col("k"),
          Seq("llr" -> "cum", "one" -> "n"))
      val bound = math.log(99.0)
      val crossing = walked
        .filter(abs(col("cum").cast("double")) >= bound)
        .agg(graft.functions.TopKAgg.minK(
          struct(col("n"), col("cum")), 1).as("w"))
        .select(col("w")(0)("n").as("stop_n"),
          col("w")(0)("cum").as("stop_llr"))
      obs.agg(count(lit(1)).as("n_obs"),
          count_if(col("x")).as("n_success"))
        .crossJoin(broadcast(crossing))
        .select(col("n_obs"), col("n_success"), col("stop_n"),
          round(col("stop_llr").cast("double"), 6).as("stop_llr"),
          when(col("stop_llr") > 0, "accept_h1").otherwise("accept_h0")
            .as("decision"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q276_seq_patterns" -> s"""
      WITH ev AS (
        SELECT user_id, event_type AS et, ts, event_id FROM events),
      span AS (
        SELECT user_id, et,
          min(ROW(ts, event_id)) AS first_occ,
          max(ROW(ts, event_id)) AS last_occ
        FROM ev GROUP BY user_id, et),
      nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ev),
      l2 AS (
        SELECT a.et || '>' || b.et AS pattern, 2 AS len,
          CAST(count(DISTINCT a.user_id) AS BIGINT) AS support
        FROM span a JOIN span b ON a.user_id = b.user_id
        WHERE a.first_occ < b.last_occ AND a.et <> b.et
        GROUP BY 1),
      l3 AS (
        SELECT a.et || '>' || m.et || '>' || c.et AS pattern, 3 AS len,
          CAST(count(DISTINCT m.user_id) AS BIGINT) AS support
        FROM ev m
        JOIN span a ON m.user_id = a.user_id
        JOIN span c ON m.user_id = c.user_id
        WHERE a.et <> m.et AND c.et <> m.et AND a.et <> c.et
          AND a.first_occ < ROW(m.ts, m.event_id)
          AND ROW(m.ts, m.event_id) < c.last_occ
        GROUP BY 1),
      pat AS (SELECT * FROM l2 UNION ALL SELECT * FROM l3)
      SELECT pattern, len, support,
        round(CAST(support AS DOUBLE) / nu, 6) AS share
      FROM pat, nu
      WHERE support * $Frac >= nu
      ORDER BY len, pattern""",

    "q277_sprt" -> """
      WITH obs AS (
        SELECT o_orderkey AS k, (o_totalprice > 150000) AS x,
          CAST(round(CASE WHEN o_totalprice > 150000
              THEN ln(CAST(0.55 AS DOUBLE) / 0.5)
              ELSE ln(CAST(0.45 AS DOUBLE) / 0.5) END, 12)
            AS DECIMAL(28,12)) AS llr
        FROM orders WHERE o_orderkey % 2 = 0),
      walk AS (
        SELECT k, x, llr,
          sum(llr) OVER (ORDER BY k) AS cum,
          CAST(sum(1) OVER (ORDER BY k) AS BIGINT) AS n
        FROM obs),
      crossing AS (
        SELECT n AS stop_n, cum AS stop_llr FROM walk
        WHERE abs(CAST(cum AS DOUBLE)) >= ln(CAST(99.0 AS DOUBLE))
        ORDER BY n LIMIT 1)
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM obs) AS n_obs,
        (SELECT CAST(count(*) FILTER (WHERE x) AS BIGINT) FROM obs)
          AS n_success,
        stop_n,
        round(CAST(stop_llr AS DOUBLE), 6) AS stop_llr,
        CASE WHEN stop_llr > 0 THEN 'accept_h1'
             ELSE 'accept_h0' END AS decision
      FROM crossing""",
  )
}
