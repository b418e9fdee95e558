package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 64 (SURVEY.md §2.4):
  *
  *  - q208: recency-decayed popularity — trending ranking where each
  *    event contributes 1/(1+age_days) (a hyperbolic decay, rational
  *    by construction, unlike exp/pow whose libm bits differ across
  *    engines). Shape: one groupBy to the bounded (type, age) grid,
  *    decay weights pinned to 9dp DECIMAL on that grid, exact decimal
  *    weighted sum — so identical under any partitioning and any
  *    engine. The reference day is the corpus max, carried as a
  *    one-row broadcast, never a driver literal.
  */
object Analytics57 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_recency_popularity" -> ((spark, dir) => {
      val ev = t(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"))
      val ref = ev.agg(max(col("day")).as("ref_day"))
      val grid = ev.crossJoin(broadcast(ref))
        .groupBy(col("event_type"),
          datediff(col("ref_day"), col("day")).as("age"))
        .agg(count(lit(1)).as("cnt"))
      grid
        .withColumn("w",
          round(lit(1.0) / (lit(1) + col("age")), 9).cast("decimal(12,9)"))
        .groupBy("event_type")
        .agg(sum(col("cnt")).as("n_events"),
          sum(col("cnt") * col("w")).cast("decimal(38,9)").as("score"))
        .select(col("event_type"), col("n_events"),
          round(col("score").cast("double"), 6).as("decayed_score"))
        .orderBy(col("decayed_score").desc, col("event_type"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q208_recency_popularity" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |ref AS (SELECT max(day) AS ref_day FROM ev),
        |grid AS (
        |  SELECT event_type, ref_day - day AS age,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM ev CROSS JOIN ref GROUP BY 1, 2),
        |wg AS (
        |  SELECT event_type, cnt,
        |    CAST(round(CAST(1.0 AS DOUBLE) / (1 + age), 9)
        |      AS DECIMAL(12,9)) AS w
        |  FROM grid)
        |SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_events,
        |  round(CAST(CAST(sum(cnt * w) AS DECIMAL(38,9)) AS DOUBLE), 6)
        |    AS decayed_score
        |FROM wg GROUP BY 1
        |ORDER BY decayed_score DESC, event_type""".stripMargin,
  )
}
