package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 116b (SURVEY.md §2.4):
  *
  *  - q275: multi-model marketing attribution — every purchase closes a
  *    "journey" of the user's preceding events (journey id = the
  *    reverse running count of purchases, so each touch binds to the
  *    NEXT purchase; all windows are per-user, bounded partitions).
  *    Four standard credit models are computed side by side per
  *    touchpoint type: first-touch, last-touch, linear (1/n), and
  *    U-shaped (40/40/20 with the middle share split evenly).
  *    Fractional credits round→DECIMAL(18,9) before the order-free
  *    sums (the q261 discipline); only the final report casts to
  *    rounded doubles.
  */
object Analytics99 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q275_attribution" -> ((spark, dir) => {
      val wRev = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val ev = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("jid",
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(wRev))
        .filter(col("jid") >= 1)
      // Touches = the journey's non-purchase events, positioned in time
      // order; the purchase row itself only closes the journey.
      val wJourney = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "jid")
        .orderBy(col("ts"), col("event_id"))
      val touches = ev
        .filter(col("event_type") =!= "purchase")
        .withColumn("pos", row_number().over(wJourney))
        .withColumn("n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id", "jid")))
      val credited = touches.select(col("event_type"),
        when(col("pos") === 1, lit(1L)).otherwise(lit(0L)).as("first_c"),
        when(col("pos") === col("n"), lit(1L)).otherwise(lit(0L))
          .as("last_c"),
        expr("cast(round(cast(1.0 as double) / n, 9) as decimal(18,9))")
          .as("linear_c"),
        expr("""cast(round(
               |  CASE WHEN n = 1 THEN cast(1.0 as double)
               |       WHEN n = 2 THEN cast(0.5 as double)
               |       WHEN pos = 1 OR pos = n THEN cast(0.4 as double)
               |       ELSE cast(0.2 as double) / (n - 2) END, 9)
               |  as decimal(18,9))"""
          .stripMargin).as("ushape_c"))
      credited.groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          sum(col("first_c")).as("ft"),
          sum(col("last_c")).as("lt"),
          sum(col("linear_c")).as("lin"),
          sum(col("ushape_c")).as("ush"))
        .select(col("event_type"), col("n_touches"),
          col("ft").as("first_touch"), col("lt").as("last_touch"),
          round(col("lin").cast("double"), 6).as("linear"),
          round(col("ush").cast("double"), 6).as("u_shape"))
        .orderBy("event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q275_attribution" -> """
      WITH ev AS (
        SELECT user_id, ts, event_id, event_type,
          sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)
            AS jid
        FROM events),
      journeys AS (SELECT * FROM ev WHERE jid >= 1),
      touches AS (
        SELECT event_type,
          row_number() OVER (PARTITION BY user_id, jid
            ORDER BY ts, event_id) AS pos,
          count(*) OVER (PARTITION BY user_id, jid) AS n
        FROM journeys WHERE event_type <> 'purchase'),
      credited AS (
        SELECT event_type,
          CASE WHEN pos = 1 THEN 1 ELSE 0 END AS first_c,
          CASE WHEN pos = n THEN 1 ELSE 0 END AS last_c,
          CAST(round(CAST(1.0 AS DOUBLE) / n, 9) AS DECIMAL(18,9)) AS linear_c,
          CAST(round(
            CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
                 WHEN n = 2 THEN CAST(0.5 AS DOUBLE)
                 WHEN pos = 1 OR pos = n THEN CAST(0.4 AS DOUBLE)
                 ELSE CAST(0.2 AS DOUBLE) / (n - 2) END, 9)
            AS DECIMAL(18,9)) AS ushape_c
        FROM touches)
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS n_touches,
        CAST(sum(first_c) AS BIGINT) AS first_touch,
        CAST(sum(last_c) AS BIGINT) AS last_touch,
        round(CAST(sum(linear_c) AS DOUBLE), 6) AS linear,
        round(CAST(sum(ushape_c) AS DOUBLE), 6) AS u_shape
      FROM credited
      GROUP BY event_type
      ORDER BY event_type""",
  )
}
