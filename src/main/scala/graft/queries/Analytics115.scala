package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 134 (SURVEY.md §2.4):
  *
  *  - q303: exact Shapley-value channel attribution over the three
  *    pre-purchase touchpoint channels (view / click / signup). The
  *    coalition value v(S) is the observed conversion rate of users
  *    whose pre-first-purchase touch set is exactly S (v(∅)=0,
  *    unobserved coalitions 0) — the Zhao et al. formulation of
  *    Shapley marketing attribution. With k=3 the Shapley weights are
  *    the exact rationals 1/3, 1/6, 1/3, so each channel's value is
  *    one closed-form double expression over the 8 coalition rates.
  *    Shape: one user-grain aggregate (map-side combinable) → an
  *    8-row coalition frame → a 1-row pivot; only the user aggregate
  *    touches data scale.
  */
object Analytics115 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q303_shapley_attribution" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("ts")).as("pts"))
      def touched(ch: String) = max(
        when(col("event_type") === ch &&
          (col("pts").isNull || col("ts") < col("pts")), 1).otherwise(0))
      val users = ev.join(firstP, Seq("user_id"), "left")
        .groupBy("user_id").agg(
          touched("view").as("hv"), touched("click").as("hc"),
          touched("signup").as("hs"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("conv"))
      val coal = users
        .groupBy((col("hv") + col("hc") * 2 + col("hs") * 4).as("mask"))
        .agg(count(lit(1)).as("nu"), sum(col("conv")).as("nc"))
      // v(S): observed conversion rate; v(∅) pinned to 0 (baseline)
      def v(m: Int) = s"coalesce(v$m, 0.0d)"
      val vCols = (0 to 7).map(m => max(when(col("mask") === m,
        when(lit(m) === 0, lit(0.0))
          .otherwise(expr("nc / cast(nu as double)"))))
        .as(s"v$m"))
      val wide = coal.agg(vCols.head, vCols.tail: _*)
      val phi = wide.selectExpr(
        s"""round((${v(1)} - ${v(0)}) / 3.0d
           |  + ((${v(3)} - ${v(2)}) + (${v(5)} - ${v(4)})) / 6.0d
           |  + (${v(7)} - ${v(6)}) / 3.0d, 6) as phi_view""".stripMargin,
        s"""round((${v(2)} - ${v(0)}) / 3.0d
           |  + ((${v(3)} - ${v(1)}) + (${v(6)} - ${v(4)})) / 6.0d
           |  + (${v(7)} - ${v(5)}) / 3.0d, 6) as phi_click""".stripMargin,
        s"""round((${v(4)} - ${v(0)}) / 3.0d
           |  + ((${v(5)} - ${v(1)}) + (${v(6)} - ${v(2)})) / 6.0d
           |  + (${v(7)} - ${v(3)}) / 3.0d, 6) as phi_signup""".stripMargin)
      phi.selectExpr(
        """stack(3, 'view', phi_view, 'click', phi_click,
          |  'signup', phi_signup) as (channel, shapley)""".stripMargin)
        .orderBy("channel")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q303_shapley_attribution" -> """
      WITH ev AS (SELECT user_id, event_type, ts FROM events),
      firstp AS (
        SELECT user_id, min(ts) AS pts FROM ev
        WHERE event_type = 'purchase' GROUP BY user_id),
      users AS (
        SELECT ev.user_id,
          max(CASE WHEN event_type = 'view'
            AND (pts IS NULL OR ts < pts) THEN 1 ELSE 0 END) AS hv,
          max(CASE WHEN event_type = 'click'
            AND (pts IS NULL OR ts < pts) THEN 1 ELSE 0 END) AS hc,
          max(CASE WHEN event_type = 'signup'
            AND (pts IS NULL OR ts < pts) THEN 1 ELSE 0 END) AS hs,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM ev LEFT JOIN firstp ON ev.user_id = firstp.user_id
        GROUP BY ev.user_id),
      coal AS (
        SELECT hv + hc * 2 + hs * 4 AS mask,
          CAST(count(*) AS BIGINT) AS nu, CAST(sum(conv) AS BIGINT) AS nc
        FROM users GROUP BY 1),
      wide AS (
        SELECT
          max(CASE WHEN mask = 0 THEN 0.0 END) AS v0,
          max(CASE WHEN mask = 1 THEN nc / CAST(nu AS DOUBLE) END) AS v1,
          max(CASE WHEN mask = 2 THEN nc / CAST(nu AS DOUBLE) END) AS v2,
          max(CASE WHEN mask = 3 THEN nc / CAST(nu AS DOUBLE) END) AS v3,
          max(CASE WHEN mask = 4 THEN nc / CAST(nu AS DOUBLE) END) AS v4,
          max(CASE WHEN mask = 5 THEN nc / CAST(nu AS DOUBLE) END) AS v5,
          max(CASE WHEN mask = 6 THEN nc / CAST(nu AS DOUBLE) END) AS v6,
          max(CASE WHEN mask = 7 THEN nc / CAST(nu AS DOUBLE) END) AS v7
        FROM coal),
      phi AS (
        SELECT
          round((coalesce(v1, 0.0) - coalesce(v0, 0.0)) / 3.0
            + ((coalesce(v3, 0.0) - coalesce(v2, 0.0))
              + (coalesce(v5, 0.0) - coalesce(v4, 0.0))) / 6.0
            + (coalesce(v7, 0.0) - coalesce(v6, 0.0)) / 3.0, 6)
            AS phi_view,
          round((coalesce(v2, 0.0) - coalesce(v0, 0.0)) / 3.0
            + ((coalesce(v3, 0.0) - coalesce(v1, 0.0))
              + (coalesce(v6, 0.0) - coalesce(v4, 0.0))) / 6.0
            + (coalesce(v7, 0.0) - coalesce(v5, 0.0)) / 3.0, 6)
            AS phi_click,
          round((coalesce(v4, 0.0) - coalesce(v0, 0.0)) / 3.0
            + ((coalesce(v5, 0.0) - coalesce(v1, 0.0))
              + (coalesce(v6, 0.0) - coalesce(v2, 0.0))) / 6.0
            + (coalesce(v7, 0.0) - coalesce(v3, 0.0)) / 3.0, 6)
            AS phi_signup
        FROM wide)
      SELECT channel, shapley FROM (
        SELECT 'view' AS channel, phi_view AS shapley FROM phi
        UNION ALL
        SELECT 'click', phi_click FROM phi
        UNION ALL
        SELECT 'signup', phi_signup FROM phi) u
      ORDER BY channel""",
  )
}
