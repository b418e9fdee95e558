package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 42 (SURVEY.md §2.4):
  *
  *  - q164: linear multi-touch attribution — every click/view in the
  *    3-day lookback shares a purchase's value equally (q86 gives the
  *    last touch everything; marketing teams run both). The pairing is
  *    a user-keyed equi-join with the time window as a residual
  *    predicate (the q108 temporal-join shape — scales as a keyed
  *    shuffle, never a time cross-join); per-purchase touch counts
  *    come from a window over the purchase id, whose partitions are
  *    bounded by the lookback. Each credit rounds →DECIMAL(18,6)
  *    before the per-channel sum, so cross-partition float order
  *    cannot drift the totals.
  */
object Analytics38 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q164_linear_attribution" -> ((spark, dir) => {
      val ev = t(spark, dir, "events")
      val touches = ev
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id").as("tu"), col("ts").as("t_ts"),
          col("event_type").as("t_type"), col("event_id").as("t_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_id"),
          round(col("value"), 6).cast("decimal(18,6)").as("p_val"))
      val paired = purchases.join(touches,
        col("user_id") === col("tu") &&
          col("t_ts") <= col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 3 DAYS"),
        "left")
      val counted = paired.withColumn("n_touch",
        count(col("t_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("p_id")))
      counted
        .select(coalesce(col("t_type"), lit("direct")).as("channel"),
          when(col("t_id").isNotNull,
            round(col("p_val").cast("double") / col("n_touch"), 6)
              .cast("decimal(18,6)"))
            .otherwise(col("p_val")).as("credit"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_credits"),
          round(sum(col("credit")).cast("double"), 4)
            .as("attributed_value"))
        .orderBy("channel")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q164_linear_attribution" ->
      """WITH touches AS (
        |  SELECT user_id AS tu, ts AS t_ts, event_type AS t_type,
        |    event_id AS t_id
        |  FROM events WHERE event_type IN ('click', 'view')),
        |purchases AS (
        |  SELECT user_id, ts AS p_ts, event_id AS p_id,
        |    CAST(round(value, 6) AS DECIMAL(18,6)) AS p_val
        |  FROM events WHERE event_type = 'purchase'),
        |paired AS (
        |  SELECT p.*, t.t_type, t.t_id
        |  FROM purchases p LEFT JOIN touches t
        |    ON p.user_id = t.tu AND t.t_ts <= p.p_ts
        |    AND t.t_ts >= p.p_ts - INTERVAL 3 DAY),
        |counted AS (
        |  SELECT *, count(t_id) OVER (PARTITION BY p_id) AS n_touch
        |  FROM paired),
        |credits AS (
        |  SELECT coalesce(t_type, 'direct') AS channel,
        |    CASE WHEN t_id IS NOT NULL
        |      THEN CAST(round(CAST(p_val AS DOUBLE) / n_touch, 6)
        |        AS DECIMAL(18,6))
        |      ELSE p_val END AS credit
        |  FROM counted)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
        |  round(CAST(sum(credit) AS DOUBLE), 4) AS attributed_value
        |FROM credits GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
