package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 63 (SURVEY.md §2.4):
  *
  *  - q206: rolling 7-day distinct actives — the sliding-window COUNT
  *    DISTINCT no window frame can express exactly. Shape: collapse to
  *    distinct (user, day) FIRST (the only corpus-sized shuffle), then
  *    each user-day contributes to its 7 covering windows via a
  *    7-element sequence explode — linear fan-out, map-side combinable,
  *    no range self-join. Only days that actually occur in the data are
  *    emitted (left-semi against the day set).
  *  - q207: point-in-time SCD2 audit — replays every order against the
  *    q203 dimension at its own order date (BETWEEN valid_from and
  *    open-ended valid_to) and proves the intervals tile: every order
  *    covered by EXACTLY one version, plus the share whose own priority
  *    agrees with the day-snapshot version. The join co-partitions on
  *    custkey; version counts per customer are bounded, so the range
  *    filter is per-group constant work.
  */
object Analytics56 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_rolling_actives" -> ((spark, dir) => {
      val ud = t(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val days = ud.select(col("day").as("target_day")).distinct()
      val contrib = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("off")).as("target_day"))
        .distinct()
        .join(days, Seq("target_day"), "left_semi")
      val daily = ud.groupBy(col("day").as("target_day"))
        .agg(countDistinct(col("user_id")).as("day_users"))
      contrib.groupBy("target_day")
        .agg(countDistinct(col("user_id")).as("rolling7_users"))
        .join(daily, "target_day")
        .select(col("target_day"), col("day_users"), col("rolling7_users"))
        .orderBy("target_day")
    }),

    "q207_scd2_pit_audit" -> ((spark, dir) => {
      val dim = Analytics55.queries("q203_scd2_priority")(spark, dir)
        .select(col("o_custkey").as("d_custkey"), col("prio"),
          col("valid_from"), col("valid_to"))
      val facts = t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("od"), col("o_orderpriority"))
      val joined = facts
        .join(dim, col("o_custkey") === col("d_custkey")
          && col("od") >= col("valid_from")
          && (col("valid_to").isNull || col("od") <= col("valid_to")), "left")
      joined.groupBy("o_orderkey")
        .agg(first(col("o_orderpriority")).as("fact_prio"),
          count(col("prio")).as("n_versions"),
          max(col("prio")).as("dim_prio"))
        .agg(count(lit(1)).as("n_orders"),
          count_if(col("n_versions") === 1).as("n_covered_once"),
          count_if(col("n_versions") =!= 1).as("n_coverage_holes"),
          count_if(col("n_versions") === 1
            && col("fact_prio") === col("dim_prio")).as("n_prio_agree"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q206_rolling_actives" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day AS target_day FROM ud),
        |contrib AS (
        |  SELECT DISTINCT ud.user_id, ud.day + o.off AS target_day
        |  FROM ud CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) o(off)),
        |roll AS (
        |  SELECT c.target_day,
        |    CAST(count(DISTINCT c.user_id) AS BIGINT) AS rolling7_users
        |  FROM contrib c JOIN days d ON c.target_day = d.target_day
        |  GROUP BY 1),
        |daily AS (
        |  SELECT day AS target_day,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS day_users
        |  FROM ud GROUP BY 1)
        |SELECT r.target_day, day_users, rolling7_users
        |FROM roll r JOIN daily USING (target_day)
        |ORDER BY target_day""".stripMargin,

    "q207_scd2_pit_audit" -> {
      val dim = Analytics55.oracleSql("q203_scd2_priority")
      s"""WITH dim AS MATERIALIZED (
         |  SELECT o_custkey AS d_custkey, prio, valid_from, valid_to
         |  FROM ($dim) v),
         |facts AS (
         |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
         |    o_orderpriority
         |  FROM orders),
         |per_order AS (
         |  SELECT f.o_orderkey,
         |    any_value(f.o_orderpriority) AS fact_prio,
         |    CAST(count(d.prio) AS BIGINT) AS n_versions,
         |    max(d.prio) AS dim_prio
         |  FROM facts f LEFT JOIN dim d
         |    ON f.o_custkey = d.d_custkey AND f.od >= d.valid_from
         |    AND (d.valid_to IS NULL OR f.od <= d.valid_to)
         |  GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(count(*) FILTER (n_versions = 1) AS BIGINT) AS n_covered_once,
         |  CAST(count(*) FILTER (n_versions <> 1) AS BIGINT) AS n_coverage_holes,
         |  CAST(count(*) FILTER (n_versions = 1 AND fact_prio = dim_prio)
         |    AS BIGINT) AS n_prio_agree
         |FROM per_order""".stripMargin
    },
  )
}
