package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 41 (SURVEY.md §2.4):
  *
  *  - q163: Lorenz curve decile points — the curve behind q144's Gini
  *    scalar: cumulative revenue share at each customer decile. One
  *    GlobalPrefixSum rank scan buckets customers by the integer
  *    formula ((rank−1)·10 div n + 1); per-decile cents aggregate
  *    exactly and the cumulative walk runs over the ten-row decile
  *    frame (bounded — never a second fact-scale scan). Shares divide
  *    once, at output.
  */
object Analytics37 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q163_lorenz_points" -> ((spark, dir) => {
      val rev = t(spark, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("decimal(18,0)").as("cents"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        rev.withColumn("one", lit(1L)),
        struct(col("cents").as("s"), col("o_custkey").as("k")),
        "one", "rnk")
      val n = rev.agg(count(lit(1)).as("n_cust"))
      val deciles = ranked.crossJoin(broadcast(n))
        .withColumn("decile", expr("((rnk - 1) * 10) div n_cust + 1"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).cast("decimal(38,0)").as("decile_cents"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("decile")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val tot = rev.agg(sum(col("cents")).cast("decimal(38,0)").as("tot"))
      deciles
        .withColumn("cum_cents",
          sum(col("decile_cents")).over(w).cast("decimal(38,0)"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_customers"),
          col("decile_cents").cast("long").as("decile_cents"),
          round(col("cum_cents").cast("double") /
            col("tot").cast("double"), 6).as("cum_share"))
        .orderBy("decile")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q163_lorenz_points" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS cents
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT cents,
        |    row_number() OVER (ORDER BY cents, o_custkey) AS rnk,
        |    CAST(count(*) OVER () AS BIGINT) AS n_cust
        |  FROM rev),
        |dec AS (
        |  SELECT ((rnk - 1) * 10) // n_cust + 1 AS decile,
        |    CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(cents) AS DECIMAL(38,0)) AS decile_cents
        |  FROM rk GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS DECIMAL(38,0)) AS tot FROM rev)
        |SELECT decile, n_customers,
        |  CAST(decile_cents AS BIGINT) AS decile_cents,
        |  round(CAST(CAST(sum(decile_cents) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0)) AS DOUBLE)
        |    / CAST(tot AS DOUBLE), 6) AS cum_share
        |FROM dec, tot ORDER BY decile""".stripMargin,
  )
}
