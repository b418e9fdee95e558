package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 23 (SURVEY.md §2.4):
  *
  *  - q137: running stock balance — the inventory ledger: per part,
  *    returns restock (+qty) and shipments draw down (−qty); a
  *    part-keyed ordered window produces the running balance, and the
  *    report surfaces the 20 worst drawdowns (min balance, stockout
  *    row count, final position = the plain delta sum) through the
  *    bounded min-k aggregate. Integers end to end.
  *  - q138: weighted quantiles by rank selection — q136 generalized:
  *    one GlobalPrefixSum scan accumulates QUANTITY weights in value
  *    order; the weighted q-quantile is the smallest value whose
  *    cumulative weight reaches ⌈q·W⌉ (integer-exact targets), picked
  *    by a conditional min — still no global sort, no percentile
  *    state.
  */
object Analytics21 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_stock_balance" -> ((spark, dir) => {
      val moves = t(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"),
          when(col("l_returnflag") === "R", col("l_quantity").cast("long"))
            .otherwise(-col("l_quantity").cast("long")).as("delta"))
      val w = Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      val ledger = moves.withColumn("balance", sum(col("delta")).over(w))
      val perPart = ledger.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_moves"),
          min(col("balance")).as("min_balance"),
          sum(col("delta")).as("final_balance"),
          count_if(col("balance") < 0).as("n_stockout_rows"))
      perPart.groupBy()
        .agg(graft.functions.TopKAgg.minK(
          struct(col("min_balance").as("mb"), col("l_partkey").as("pk"),
            col("n_moves").as("nm"), col("final_balance").as("fb"),
            col("n_stockout_rows").as("ns")), 20).as("w"))
        .select(explode(col("w")).as("m"))
        .select(col("m.pk").as("l_partkey"), col("m.mb").as("min_balance"),
          col("m.fb").as("final_balance"), col("m.nm").as("n_moves"),
          col("m.ns").as("n_stockout_rows"))
        .orderBy("min_balance", "l_partkey")
    }),

    "q138_weighted_median" -> ((spark, dir) => {
      val vals = t(spark, dir, "lineitem")
        .select(col("l_extendedprice").as("v"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity").cast("long").as("qty"))
      val ranked = graft.operators.GlobalPrefixSum.withRunningTotalBy(
        vals,
        struct(col("v").as("s"), col("l_orderkey").as("k1"),
          col("l_linenumber").as("k2")), "qty", "cumw")
      val targets = vals.agg(sum(col("qty")).as("tw"))
        .select(explode(expr(
          """array(
            |  named_struct('quantile', 0.25D,
            |    'target_w', (tw + 3) div 4),
            |  named_struct('quantile', 0.5D,
            |    'target_w', (tw + 1) div 2),
            |  named_struct('quantile', 0.75D,
            |    'target_w', (3 * tw + 3) div 4))""".stripMargin)).as("t"),
          col("tw"))
        .select(col("t.quantile").as("quantile"),
          col("t.target_w").as("target_w"), col("tw"))
      ranked.crossJoin(broadcast(targets))
        .groupBy("quantile", "target_w", "tw")
        .agg(min(when(col("cumw") >= col("target_w"), col("v")))
          .as("value"))
        .orderBy("quantile")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q137_stock_balance" ->
      """WITH moves AS (
        |  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
        |    CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT)
        |      ELSE -CAST(l_quantity AS BIGINT) END AS delta
        |  FROM lineitem),
        |ledger AS (
        |  SELECT *, sum(delta) OVER (PARTITION BY l_partkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS balance
        |  FROM moves),
        |perPart AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_moves,
        |    CAST(min(balance) AS BIGINT) AS min_balance,
        |    CAST(sum(delta) AS BIGINT) AS final_balance,
        |    CAST(count(*) FILTER (WHERE balance < 0) AS BIGINT)
        |      AS n_stockout_rows
        |  FROM ledger GROUP BY 1)
        |SELECT l_partkey, min_balance, final_balance, n_moves,
        |  n_stockout_rows
        |FROM perPart ORDER BY min_balance, l_partkey LIMIT 20""".stripMargin,

    "q138_weighted_median" ->
      """WITH ranked AS (
        |  SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |      AS BIGINT) AS cumw
        |  FROM lineitem),
        |tot AS (SELECT CAST(sum(qty) AS BIGINT) AS tw FROM ranked),
        |targets AS (
        |  SELECT 0.25 AS quantile, (tw + 3) // 4 AS target_w, tw FROM tot
        |  UNION ALL
        |  SELECT 0.5, (tw + 1) // 2, tw FROM tot
        |  UNION ALL
        |  SELECT 0.75, (3 * tw + 3) // 4, tw FROM tot)
        |SELECT CAST(quantile AS DOUBLE) AS quantile,
        |  CAST(target_w AS BIGINT) AS target_w, tw,
        |  min(CASE WHEN cumw >= target_w THEN v END) AS value
        |FROM ranked CROSS JOIN targets
        |GROUP BY 1, 2, 3 ORDER BY quantile""".stripMargin,
  )
}
