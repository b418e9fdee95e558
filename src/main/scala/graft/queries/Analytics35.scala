package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 39 (SURVEY.md §2.4):
  *
  *  - q161: DAU/MAU stickiness — the product-analytics ratio: average
  *    daily actives over monthly actives, per month. Two distinct-user
  *    rollups at different grains (per-day and per-month — each one
  *    shuffle on its grouping key), joined on the month; everything is
  *    integer until the single stickiness division. The month key
  *    renders as yyyymm INT so both engines compare identical values
  *    (timestamp rendering differs between them).
  */
object Analytics35 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q161_stickiness" -> ((spark, dir) => {
      val ev = t(spark, dir, "events")
        .select((year(col("ts")) * 100 + month(col("ts"))).as("ym"),
          to_date(col("ts")).as("d"), col("user_id"))
      val daily = ev.groupBy(col("ym"), col("d"))
        .agg(count_distinct(col("user_id")).as("dau"))
      val monthlyDau = daily.groupBy(col("ym"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("dau_sum"))
      val mau = ev.groupBy(col("ym").as("ym2"))
        .agg(count_distinct(col("user_id")).as("mau"))
      monthlyDau.join(mau, col("ym") === col("ym2"))
        .select(col("ym"), col("n_days"), col("dau_sum"), col("mau"),
          round(col("dau_sum").cast("double") /
            (col("n_days").cast("double") * col("mau").cast("double")),
            6).as("stickiness"))
        .orderBy("ym")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q161_stickiness" ->
      """WITH ev AS (
        |  SELECT CAST(year(ts) * 100 + month(ts) AS INT) AS ym,
        |    CAST(ts AS DATE) AS d, user_id
        |  FROM events),
        |daily AS (
        |  SELECT ym, d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM ev GROUP BY 1, 2),
        |monthly AS (
        |  SELECT ym, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS dau_sum
        |  FROM daily GROUP BY 1),
        |mau AS (
        |  SELECT ym, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        |  FROM ev GROUP BY 1)
        |SELECT monthly.ym, n_days, dau_sum, mau,
        |  round(CAST(dau_sum AS DOUBLE)
        |    / (CAST(n_days AS DOUBLE) * CAST(mau AS DOUBLE)), 6)
        |    AS stickiness
        |FROM monthly JOIN mau ON monthly.ym = mau.ym
        |ORDER BY 1""".stripMargin,
  )
}
