package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 138 (SURVEY.md §2.4):
  *
  *  - q314: Hill estimator of the heavy-tail index from the top-101
  *    order totals — ξ = (1/k)Σ ln(x_i/x_(k+1)), α = 1/ξ. The order
  *    statistics come from the bounded TopKAgg (k rows per map
  *    partition into the shuffle — never a global sort), ties broken
  *    by order key inside the struct; per-value logs round once to
  *    DECIMAL(18,9) so the 101-term sum is exact.
  *
  *  - q315: Western Electric control-chart audit of monthly revenue:
  *    rule 1 (|z| > 3), rule 2 (2 of 3 beyond 2σ, same side), rule 3
  *    (4 of 5 beyond 1σ, same side), rule 4 (8 consecutive same
  *    side). Center/σ from exact decimal moments; z rounded once so
  *    every zone comparison sees the same decimal in both engines;
  *    rules are ROWS-frame window counts on the calendar-bounded
  *    monthly frame.
  */
object Analytics119 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q314_hill_tail" -> ((spark, dir) => {
      val top = t(spark, dir, "orders")
        .select(struct(
          expr("cast(round(o_totalprice, 2) as decimal(18,2))").as("v"),
          col("o_orderkey").as("id")).as("s"))
        .agg(graft.functions.TopKAgg(col("s"), 101).as("top"))
      val vals = top.select(explode(col("top")).as("t"))
        .select(col("t.v").as("v"))
      val thr = vals.agg(min(col("v")).as("vk1"), count(lit(1)).as("cnt"))
      vals.crossJoin(broadcast(thr))
        .select(col("vk1"), col("cnt"), expr(
          """cast(round(ln(cast(v as double) / cast(vk1 as double)), 9)
            |  as decimal(18,9))""".stripMargin).as("lterm"))
        .groupBy("vk1", "cnt").agg(sum(col("lterm")).as("slog"))
        .selectExpr("cnt - 1 as k", "cast(vk1 as double) as x_threshold",
          "round(cast(slog as double) / (cnt - 1), 6) as xi_hill",
          "round((cnt - 1) / cast(slog as double), 6) as tail_alpha")
    }),

    "q315_spc_rules" -> ((spark, dir) => {
      val mo = t(spark, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(sum(expr("cast(round(o_totalprice, 2) as decimal(18,2))"))
          .as("rev"))
      val stats = mo.agg(count(lit(1)).as("n"), sum(col("rev")).as("sr"),
        sum(expr("cast(rev * rev as decimal(38,4))")).as("srr"))
      val z = mo.crossJoin(broadcast(stats))
        .select(col("m"), expr(
          """cast(round(
            |  (cast(rev as double) - cast(sr as double) / n)
            |  / sqrt((cast(srr as double)
            |     - n * (cast(sr as double) / n) * (cast(sr as double) / n))
            |    / (n - 1)), 6) as decimal(18,6))""".stripMargin).as("z"))
        .withColumn("pos", (col("z") > 0).cast("int"))
        .withColumn("b1p", (col("z") > 1).cast("int"))
        .withColumn("b1n", (col("z") < -1).cast("int"))
        .withColumn("b2p", (col("z") > 2).cast("int"))
        .withColumn("b2n", (col("z") < -2).cast("int"))
      val w2 = Window.orderBy("m").rowsBetween(-2, 0)
      val w4 = Window.orderBy("m").rowsBetween(-4, 0)
      val w7 = Window.orderBy("m").rowsBetween(-7, 0)
      val flagged = z
        .withColumn("r1", abs(col("z")) > 3)
        .withColumn("r2", (sum(col("b2p")).over(w2) >= 2 && col("b2p") === 1)
          || (sum(col("b2n")).over(w2) >= 2 && col("b2n") === 1))
        .withColumn("r3", (sum(col("b1p")).over(w4) >= 4 && col("b1p") === 1)
          || (sum(col("b1n")).over(w4) >= 4 && col("b1n") === 1))
        .withColumn("r4",
          (sum(col("pos")).over(w7) === 8 && count(lit(1)).over(w7) === 8)
            || (sum(col("pos")).over(w7) === 0
              && count(lit(1)).over(w7) === 8))
        .filter(col("r1") || col("r2") || col("r3") || col("r4"))
      flagged.select(date_format(col("m"), "yyyy-MM").as("month"),
          col("z").cast("double").as("z"),
          col("r1"), col("r2"), col("r3"), col("r4"))
        .orderBy("month")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q314_hill_tail" -> """
      WITH topv AS (
        SELECT CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS v
        FROM orders
        ORDER BY round(o_totalprice, 2) DESC, o_orderkey DESC
        LIMIT 101),
      thr AS (
        SELECT min(v) AS vk1, CAST(count(*) AS BIGINT) AS cnt FROM topv),
      s AS (
        SELECT vk1, cnt,
          sum(CAST(round(ln(CAST(v AS DOUBLE) / CAST(vk1 AS DOUBLE)), 9)
            AS DECIMAL(18,9))) AS slog
        FROM topv CROSS JOIN thr
        GROUP BY vk1, cnt)
      SELECT cnt - 1 AS k, CAST(vk1 AS DOUBLE) AS x_threshold,
        round(CAST(slog AS DOUBLE) / (cnt - 1), 6) AS xi_hill,
        round((cnt - 1) / CAST(slog AS DOUBLE), 6) AS tail_alpha
      FROM s""",

    "q315_spc_rules" -> """
      WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
          sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
      stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n, sum(rev) AS sr,
          sum(CAST(rev * rev AS DECIMAL(38,4))) AS srr
        FROM monthly),
      z AS (
        SELECT m,
          CAST(round(
            (CAST(rev AS DOUBLE) - CAST(sr AS DOUBLE) / n)
            / sqrt((CAST(srr AS DOUBLE)
               - n * (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n))
              / (n - 1)), 6) AS DECIMAL(18,6)) AS z
        FROM monthly CROSS JOIN stats),
      zz AS (
        SELECT m, z,
          CASE WHEN z > 0 THEN 1 ELSE 0 END AS pos,
          CASE WHEN z > 1 THEN 1 ELSE 0 END AS b1p,
          CASE WHEN z < -1 THEN 1 ELSE 0 END AS b1n,
          CASE WHEN z > 2 THEN 1 ELSE 0 END AS b2p,
          CASE WHEN z < -2 THEN 1 ELSE 0 END AS b2n
        FROM z),
      fl AS (
        SELECT m, z,
          abs(z) > 3 AS r1,
          (sum(b2p) OVER w2 >= 2 AND b2p = 1)
            OR (sum(b2n) OVER w2 >= 2 AND b2n = 1) AS r2,
          (sum(b1p) OVER w4 >= 4 AND b1p = 1)
            OR (sum(b1n) OVER w4 >= 4 AND b1n = 1) AS r3,
          (sum(pos) OVER w7 = 8 AND count(*) OVER w7 = 8)
            OR (sum(pos) OVER w7 = 0 AND count(*) OVER w7 = 8) AS r4
        FROM zz
        WINDOW
          w2 AS (ORDER BY m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
          w4 AS (ORDER BY m ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
          w7 AS (ORDER BY m ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      SELECT strftime(m, '%Y-%m') AS month, CAST(z AS DOUBLE) AS z,
        r1, r2, r3, r4
      FROM fl WHERE r1 OR r2 OR r3 OR r4
      ORDER BY month""",
  )
}
