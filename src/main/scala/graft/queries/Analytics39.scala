package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 43 (SURVEY.md §2.4):
  *
  *  - q165: weekday×hour traffic heatmap with hot-cell detection — the
  *    staffing/capacity view: events bucketed into the 168-cell
  *    (isodow, hour) grid, and each cell tested against its hour's
  *    across-weekday distribution. The 2σ test runs entirely in
  *    integers via the n-scaling device (7·(7n−S)² > 4·(7·Σn²−S²) ⟺
  *    |n−μ| > 2σ_pop — no float mean, no float variance), so hot
  *    flags can never drift between engines. Day-of-week uses
  *    weekday()+1 / isodow() — the one dow convention both engines
  *    share (dayofweek() starts Sunday=1 in Spark but Sunday=0 in
  *    DuckDB).
  */
object Analytics39 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_dow_hour_heatmap" -> ((spark, dir) => {
      val cells = t(spark, dir, "events")
        .groupBy((weekday(col("ts")) + 1).as("dow"),
          hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val hourly = cells.groupBy(col("hr").as("hr2"))
        .agg(sum(col("n")).as("s_h"),
          sum((col("n").cast("decimal(19,0)") * col("n"))
            .cast("decimal(38,0)")).cast("decimal(38,0)").as("ss_h"),
          count(lit(1)).as("n_dows"))
      // 2σ test in exact integers (DECIMAL — n² and s² pass Long at
      // fact scale): 7·(7n−S)² > 4·(7·Σn²−S²) ⟺ |n−μ| > 2σ_pop
      val dev = (lit(7) * col("n") - col("s_h")).cast("decimal(19,0)")
      cells.join(broadcast(hourly), col("hr") === col("hr2"))
        .withColumn("hot",
          lit(7) * (dev * dev).cast("decimal(38,0)") >
            lit(4) * (lit(7) * col("ss_h") -
              (col("s_h").cast("decimal(19,0)") * col("s_h"))
                .cast("decimal(38,0)")).cast("decimal(38,0)"))
        .groupBy(col("hr"))
        .agg(sum(col("n")).as("n_events"),
          count_if(col("hot")).as("n_hot_dows"),
          max(col("n")).as("peak_dow_n"))
        .orderBy("hr")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q165_dow_hour_heatmap" ->
      """WITH cells AS (
        |  SELECT isodow(ts) AS dow, hour(ts) AS hr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |hourly AS (
        |  SELECT hr, CAST(sum(n) AS BIGINT) AS s_h,
        |    CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS ss_h
        |  FROM cells GROUP BY 1),
        |flagged AS (
        |  SELECT cells.hr, n,
        |    7 * (CAST(7 * n - s_h AS HUGEINT)
        |        * CAST(7 * n - s_h AS HUGEINT))
        |      > 4 * (7 * ss_h - CAST(s_h AS HUGEINT) * s_h) AS hot
        |  FROM cells JOIN hourly ON cells.hr = hourly.hr)
        |SELECT CAST(hr AS INT) AS hr, CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(count(*) FILTER (WHERE hot) AS BIGINT) AS n_hot_dows,
        |  CAST(max(n) AS BIGINT) AS peak_dow_n
        |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
