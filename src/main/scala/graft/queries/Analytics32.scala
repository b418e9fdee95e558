package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 36 (SURVEY.md §2.4):
  *
  *  - q157: supplier scorecard — the procurement composite: volume
  *    share, return rate, and average discount fold into one weighted
  *    score per supplier. Each ratio rounds →DECIMAL(9,6) first, the
  *    weighted blend runs in EXACT decimal arithmetic over the rounded
  *    terms (the s12 rule: re-combining already-rounded floats in float
  *    re-introduces .5-ulp divergence), and only the output cast is
  *    double. Top-10 by score is a bounded TakeOrdered — never a global
  *    sort at scale. One shuffle: the supplier rollup.
  */
object Analytics32 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_supplier_scorecard" -> ((spark, dir) => {
      val per = t(spark, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          count_if(col("l_returnflag") === "R").as("n_returned"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(18,4)")).cast("decimal(38,4)").as("vol"),
          sum(col("l_discount").cast("decimal(18,2)"))
            .cast("decimal(38,2)").as("disc_sum"))
      val tot = per.agg(sum(col("vol")).cast("decimal(38,4)").as("tot"))
      val scored = per.crossJoin(broadcast(tot))
        .select(col("l_suppkey"),
          round(col("vol").cast("double") / col("tot").cast("double"), 6)
            .cast("decimal(9,6)").as("vol_share"),
          round(col("n_returned").cast("double") /
            col("n_lines").cast("double"), 6)
            .cast("decimal(9,6)").as("ret_rate"),
          round(col("disc_sum").cast("double") /
            col("n_lines").cast("double"), 6)
            .cast("decimal(9,6)").as("avg_disc"))
        .withColumn("score",
          (expr("CAST(0.5 AS DECIMAL(2,1))") * col("vol_share") +
            expr("CAST(0.3 AS DECIMAL(2,1))") *
              (expr("CAST(1.0 AS DECIMAL(2,1))") - col("ret_rate")) +
            expr("CAST(0.2 AS DECIMAL(2,1))") *
              (expr("CAST(1.0 AS DECIMAL(2,1))") - col("avg_disc")))
            .cast("double"))
      scored
        .join(broadcast(t(spark, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("vol_share").cast("double").as("vol_share"),
          col("ret_rate").cast("double").as("ret_rate"),
          col("avg_disc").cast("double").as("avg_disc"), col("score"))
        .orderBy(col("score").desc, col("s_suppkey"))
        .limit(10)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q157_supplier_scorecard" ->
      """WITH per AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
        |      AS n_returned,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS vol,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(38,2)) AS disc_sum
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(vol) AS DECIMAL(38,4)) AS tot FROM per),
        |scored AS (
        |  SELECT l_suppkey,
        |    CAST(round(CAST(vol AS DOUBLE) / CAST(tot AS DOUBLE), 6)
        |      AS DECIMAL(9,6)) AS vol_share,
        |    CAST(round(CAST(n_returned AS DOUBLE)
        |      / CAST(n_lines AS DOUBLE), 6) AS DECIMAL(9,6)) AS ret_rate,
        |    CAST(round(CAST(disc_sum AS DOUBLE)
        |      / CAST(n_lines AS DOUBLE), 6) AS DECIMAL(9,6)) AS avg_disc
        |  FROM per, tot)
        |SELECT s_suppkey, s_name,
        |  CAST(vol_share AS DOUBLE) AS vol_share,
        |  CAST(ret_rate AS DOUBLE) AS ret_rate,
        |  CAST(avg_disc AS DOUBLE) AS avg_disc,
        |  CAST(CAST(0.5 AS DECIMAL(2,1)) * vol_share
        |    + CAST(0.3 AS DECIMAL(2,1))
        |      * (CAST(1.0 AS DECIMAL(2,1)) - ret_rate)
        |    + CAST(0.2 AS DECIMAL(2,1))
        |      * (CAST(1.0 AS DECIMAL(2,1)) - avg_disc) AS DOUBLE)
        |    AS score
        |FROM scored JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY score DESC, s_suppkey LIMIT 10""".stripMargin,
  )
}
