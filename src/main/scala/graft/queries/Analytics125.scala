package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 147 (SURVEY.md §2.4):
  *
  *  - q325: Lindley queue backlog per user — W_i = max(0, W_{i−1} +
  *    service − gap_i) looks like an unvectorizable recurrence, but
  *    Lindley's recursion solves in closed form as W_i = S_i −
  *    min_{j≤i} S_j over the cumulative drift S: two windows inside
  *    user-bounded groups, no iteration. Service time = the global
  *    mean inter-arrival gap rounded to whole microseconds, so the
  *    whole drift process is exact integer micros; seconds appear
  *    only in the output. The queueing primitive behind
  *    ingestion-backlog audits.
  *
  *  - q326: Gaussian kernel density estimate of order totals at five
  *    fixed grid points (h = 20000) — per-row kernel terms round once
  *    to DECIMAL(18,9) and accumulate map-side per grid point (five
  *    aggregate columns, no explode); one scan at any scale.
  */
object Analytics125 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q325_lindley_backlog" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"),
        col("event_id"))
      val gaps = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("gap", expr(
          """cast((unix_micros(ts) - unix_micros(lag(ts, 1)
            |  over (partition by user_id order by ts, event_id)))
            |  as decimal(20,0))""".stripMargin))
        .filter(col("gap").isNotNull)
      // exact integer microseconds end to end; seconds only at output
      val svc = gaps.agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"))
        .select(expr(
          """cast(round(cast(sg as double) / n, 0) as decimal(20,0))"""
        ).as("svc"))
      val drift = gaps.crossJoin(broadcast(svc))
        .withColumn("x", col("svc") - col("gap"))
        .withColumn("s", sum(col("x")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("smin", least(min(col("s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .withColumn("wq", col("s") - col("smin"))
      drift.groupBy("user_id").agg(count(lit(1)).as("n_arrivals"),
          max(col("wq")).as("max_wq"))
        .select(col("user_id"), col("n_arrivals"),
          round(expr("cast(max_wq as double) / 1000000.0d"), 6)
            .as("max_backlog_sec"))
        .orderBy("user_id")
    }),

    "q326_kde_grid" -> ((spark, dir) => {
      val grid = Seq(100000, 200000, 300000, 400000, 500000)
      val h = 20000.0
      val terms = grid.map(g =>
        sum(expr(
          s"""cast(round(exp(-((o_totalprice - $g.0d)
             |  * (o_totalprice - $g.0d))
             |  / (2.0d * $h * $h)), 9) as decimal(28,9))"""
            .stripMargin)).as(s"k$g"))
      val allAggs = count(lit(1)).as("n") +: terms
      val agg = t(spark, dir, "orders")
        .agg(allAggs.head, allAggs.tail: _*)
      val dens = grid.map(g =>
        s"'$g', round(cast(k$g as double) " +
          s"/ (n * $h * sqrt(2.0d * pi())), 9)").mkString(", ")
      agg.selectExpr(
          s"stack(${grid.length}, $dens) as (grid_point, density)")
        .orderBy("grid_point")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q325_lindley_backlog" -> """
      WITH gaps AS (
        SELECT user_id, event_id, ts,
          CAST((epoch_us(ts) - epoch_us(lag(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)))
            AS DECIMAL(20,0)) AS gap
        FROM events),
      g2 AS (SELECT * FROM gaps WHERE gap IS NOT NULL),
      svc AS (
        SELECT CAST(round(CAST(sum(gap) AS DOUBLE) / count(*), 0)
          AS DECIMAL(20,0)) AS svc
        FROM g2),
      drift AS (
        SELECT user_id, event_id, ts, svc - gap AS x
        FROM g2 CROSS JOIN svc),
      s1 AS (
        SELECT user_id, event_id, ts,
          sum(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        FROM drift),
      s2 AS (
        SELECT user_id, s,
          least(min(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            CAST(0 AS DECIMAL(38,0))) AS smin
        FROM s1)
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_arrivals,
        round(CAST(max(s - smin) AS DOUBLE) / 1000000.0, 6)
          AS max_backlog_sec
      FROM s2 GROUP BY user_id ORDER BY user_id""",

    "q326_kde_grid" -> {
      val grid = Seq(100000, 200000, 300000, 400000, 500000)
      val h = 20000.0
      val ks = grid.map(g =>
        s"""sum(CAST(round(exp(-((o_totalprice - $g.0)
           |  * (o_totalprice - $g.0))
           |  / (2.0 * $h * $h)), 9) AS DECIMAL(28,9))) AS k$g"""
          .stripMargin).mkString(",\n          ")
      val branches = grid.map(g =>
        s"SELECT '$g' AS grid_point, round(CAST(k$g AS DOUBLE) " +
          s"/ (n * $h * sqrt(2.0 * pi())), 9) AS density FROM agg")
        .mkString("\n        UNION ALL\n        ")
      s"""
      WITH agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          $ks
        FROM orders)
      SELECT grid_point, density FROM (
        $branches) u
      ORDER BY grid_point"""
    },
  )
}
