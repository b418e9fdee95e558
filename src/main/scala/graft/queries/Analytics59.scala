package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 66 (SURVEY.md §2.4):
  *
  *  - q210: FORWARD as-of join — each purchase matched to the user's
  *    first click at-or-after it (post-purchase re-engagement). The
  *    mirror of q28's backward join, exercising the new
  *    `AsOfJoin.asofForward` merge pass: one shuffle on user_id, one
  *    ordered window, no range cross-join. DuckDB's native ASOF is the
  *    oracle, direction flipped.
  *  - q211: NEAREST as-of join — each purchase matched to the
  *    time-closest click in either direction, backward preferred on
  *    exact-tie distances, with the chosen direction in the output.
  *    Oracle replays the semantics as an explicit arg_min over a
  *    composite (distance, direction, direction-adjusted tiebreak)
  *    key — the fully-spelled contract the operator promises.
  */
object Analytics59 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_asof_forward" -> ((spark, dir) => {
      val ev = t(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asofForward(
          purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
          rightTiebreak = Some("click_id"))
        .orderBy("event_id")
    }),

    "q211_asof_nearest" -> ((spark, dir) => {
      val ev = t(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      graft.operators.AsOfJoin.asofNearest(
          purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"),
          rightTiebreak = Some("click_id"))
        .orderBy("event_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q210_asof_forward" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  c.event_id AS asof_click_id, c.ts AS asof_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts >= e.ts
        |ORDER BY e.event_id""".stripMargin,

    "q211_asof_nearest" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |cand AS (
        |  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.ts AS c_ts,
        |    abs(epoch_us(p.ts) - epoch_us(c.ts)) AS dist,
        |    CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END AS dir,
        |    CASE WHEN c.ts <= p.ts THEN -c.click_id ELSE c.click_id END
        |      AS adj_tb
        |  FROM p JOIN c ON p.user_id = c.user_id),
        |best AS (
        |  SELECT event_id, click_id AS asof_click_id, c_ts AS asof_ts,
        |    CASE WHEN dir = 0 THEN 'backward' ELSE 'forward' END AS asof_dir
        |  FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY event_id ORDER BY dist, dir, adj_tb) AS rn
        |    FROM cand)
        |  WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts, b.asof_click_id, b.asof_ts,
        |  coalesce(b.asof_dir, 'none') AS asof_dir
        |FROM p LEFT JOIN best b ON p.event_id = b.event_id
        |ORDER BY p.event_id""".stripMargin,
  )
}
