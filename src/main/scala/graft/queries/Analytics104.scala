package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 121 (SURVEY.md §2.4):
  *
  *  - q284: the NATIVE as-of join ([[graft.plans.AsOfJoinPlan]]) on the
  *    q28 workload — custom LogicalPlan node, custom planner strategy,
  *    custom SparkPlan whose ClusteredDistribution/ordering
  *    requirements let EnsureRequirements plan the one co-partitioning
  *    exchange per side; the merge itself is a per-partition O(left +
  *    right) scan with O(1) state. Same DuckDB ASOF JOIN oracle as the
  *    composition-based q28 — two implementations, one contract, both
  *    hash-checked (and pinned equal to each other in Round9vSpec).
  */
object Analytics104 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q284_asof_native" -> ((spark, dir) => {
      val ev = Tables.events(spark, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("right_user_id"),
          col("event_id").as("asof_click_id"), col("ts").as("asof_ts"))
      // click_id rides the Exec's required right ordering: at equal
      // (user, ts) the merge keeps the last-consumed row, so ascending
      // click_id makes "highest wins" deterministic.
      graft.plans.AsOfJoinPlan
        .asof(purchases, clicks, Seq("user_id"), "ts", "asof_ts",
          rightTiebreak = Seq("asof_click_id"))
        .select("event_id", "user_id", "ts", "asof_click_id", "asof_ts")
        .orderBy("event_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q284_asof_native" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  c.event_id AS asof_click_id, c.ts AS asof_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
  )
}
