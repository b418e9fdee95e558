package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 14 (SURVEY.md §2.4):
  *
  *  - q123: CUSUM changepoint — level-shift detection on the daily
  *    revenue series. The classic statistic argmax_k |Σ_{i≤k}(x_i−x̄)|
  *    is rescaled by n (dev_k = n·cusum_k − k·total) so the whole
  *    search runs in EXACT decimal cents — no float mean, no drift,
  *    both engines replay bit-identically. The daily frame is
  *    calendar-bounded, so its ordering window is bounded at any
  *    corpus scale; the argmax runs through the bounded min-k
  *    aggregate.
  *  - q124: day-of-week seasonal index — per-DOW revenue means against
  *    the global mean. DOW comes from epoch-day mod 7 (portable —
  *    DuckDB's dayofweek() and Spark's differ by origin); sums are
  *    exact decimal cents; each output float is one division chain
  *    associated identically on both sides.
  *  - q125: FIFO allocation — the inventory-costing interval algebra:
  *    per part, cumulative-quantity intervals of demand lines match
  *    overlapping cumulative intervals of supply (returns) lines;
  *    matched units per pair = interval intersection length. Both
  *    cumulative passes are part-keyed windows (bounded per-part line
  *    counts at any SF); the pair join is part-keyed with bounded
  *    fan-out, and total matched per part = min(demand, supply) by
  *    construction (pinned in the spec).
  */
object Analytics14 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_cusum_changepoint" -> ((spark, dir) => {
      // factors cast to exact DECIMAL BEFORE the multiply (the q1/q4
      // revenue idiom) — rounding a float product lands on half-cent
      // boundaries where the engines' rounding paths disagree
      val daily = t(spark, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      // calendar-bounded frame (~2.5k rows at ANY corpus scale) — the
      // ordering window here can never become a scale bottleneck
      val w = Window.orderBy("day")
      val cum = daily
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("cusum", sum(col("rev")).over(w))
      val totals = daily.agg(count(lit(1)).as("n_days"),
        sum(col("rev")).as("total_rev"))
      val dev = cum.crossJoin(broadcast(totals))
        .withColumn("dev", (col("cusum") * col("n_days") -
          col("total_rev") * col("k")).cast("decimal(38,4)"))
      dev.groupBy("n_days", "total_rev")
        .agg(graft.functions.TopKAgg.minK(
          struct((-abs(col("dev"))).as("negd"), col("day").as("d"),
            col("k").as("kk"), col("cusum").as("cs")), 1).as("w"))
        .select(col("n_days"), col("total_rev"), col("w")(0)("d").as("cp_day"),
          col("w")(0)("kk").as("cp_k"), col("w")(0)("cs").as("cp_cusum"),
          (-col("w")(0)("negd")).as("max_abs_dev"))
        // the n-scaled statistic stays EXACT decimal — dividing it back
        // by n here round(double)-ed onto a .5-ulp boundary where the
        // engines' rounding paths disagree (the s12 lesson)
        .select(col("cp_day"), col("n_days"), col("cp_k"),
          col("max_abs_dev").cast("double").as("max_dev_scaled"),
          round(col("cp_cusum").cast("double") / col("cp_k"), 6)
            .as("pre_mean"),
          round((col("total_rev") - col("cp_cusum")).cast("double") /
            (col("n_days") - col("cp_k")), 6).as("post_mean"))
    }),

    "q124_seasonal_index" -> ((spark, dir) => {
      val byDow = t(spark, dir, "orders")
        .groupBy((datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          % 7).as("dow"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice"), 2).cast("decimal(18,2)"))
            .as("dow_rev"))
      val totals = byDow.agg(sum(col("n_orders")).as("total_n"),
        sum(col("dow_rev")).as("total_rev"))
      byDow.crossJoin(broadcast(totals))
        .select(col("dow"), col("n_orders"),
          col("dow_rev").cast("double").as("dow_rev"),
          round(col("dow_rev").cast("double") / col("n_orders"), 6)
            .as("mean_rev"),
          round(col("dow_rev").cast("double") * col("total_n") /
            (col("n_orders") * col("total_rev").cast("double")), 6)
            .as("seasonal_index"))
        .orderBy("dow")
    }),

    "q125_fifo_allocation" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_quantity").cast("long").as("qty"),
          (col("l_returnflag") === "R").as("is_supply"))
      val w = Window.partitionBy("l_partkey", "is_supply")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      val iv = li.withColumn("hi", sum(col("qty")).over(w))
        .withColumn("lo", col("hi") - col("qty"))
      val d = iv.filter(!col("is_supply"))
        .select(col("l_partkey"), col("lo").as("d_lo"), col("hi").as("d_hi"))
      val s = iv.filter(col("is_supply"))
        .select(col("l_partkey").as("s_partkey"), col("lo").as("s_lo"),
          col("hi").as("s_hi"))
      val pairs = d.join(s, col("l_partkey") === col("s_partkey") &&
          col("d_lo") < col("s_hi") && col("s_lo") < col("d_hi"))
        .select(col("l_partkey"),
          (least(col("d_hi"), col("s_hi")) -
            greatest(col("d_lo"), col("s_lo"))).as("units"))
      val perPart = pairs.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_pairs"), sum(col("units")).as("matched"))
      val tot = li.groupBy("l_partkey")
        .agg(sum(when(!col("is_supply"), col("qty")).otherwise(0L))
            .as("demand_units"),
          sum(when(col("is_supply"), col("qty")).otherwise(0L))
            .as("supply_units"))
      val top = perPart.join(tot, "l_partkey")
        .groupBy()
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("matched")).as("negm"), col("l_partkey").as("pk"),
            col("n_pairs").as("np"), col("demand_units").as("du"),
            col("supply_units").as("su")), 20).as("w"))
        .select(explode(col("w")).as("m"))
      top.select(col("m.pk").as("l_partkey"), (-col("m.negm")).as("matched"),
          col("m.np").as("n_pairs"), col("m.du").as("demand_units"),
          col("m.su").as("supply_units"))
        .withColumn("matched_frac", round(col("matched").cast("double") /
          greatest(least(col("demand_units"), col("supply_units")), lit(1L)),
          6))
        .orderBy(col("matched").desc, col("l_partkey"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q123_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT day,
        |    CAST(count(*) OVER (ORDER BY day) AS BIGINT) AS k,
        |    sum(rev) OVER (ORDER BY day) AS cusum
        |  FROM daily),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days, sum(rev) AS total_rev
        |  FROM daily),
        |dev AS (
        |  SELECT day, k, cusum, n_days, total_rev,
        |    CAST(cusum * n_days - total_rev * k AS DECIMAL(38,4)) AS dev
        |  FROM cum CROSS JOIN tot),
        |best AS (
        |  SELECT * FROM dev
        |  ORDER BY abs(dev) DESC, day LIMIT 1)
        |SELECT day AS cp_day, n_days, k AS cp_k,
        |  CAST(abs(dev) AS DOUBLE) AS max_dev_scaled,
        |  round(CAST(cusum AS DOUBLE) / k, 6) AS pre_mean,
        |  round(CAST(total_rev - cusum AS DOUBLE) / (n_days - k), 6)
        |    AS post_mean
        |FROM best""".stripMargin,

    "q124_seasonal_index" ->
      """WITH byDow AS (
        |  SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7 AS dow,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS dow_rev
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_orders) AS BIGINT) AS total_n,
        |    sum(dow_rev) AS total_rev
        |  FROM byDow)
        |SELECT CAST(dow AS INTEGER) AS dow, n_orders,
        |  CAST(dow_rev AS DOUBLE) AS dow_rev,
        |  round(CAST(dow_rev AS DOUBLE) / n_orders, 6) AS mean_rev,
        |  round(CAST(dow_rev AS DOUBLE) * total_n /
        |    (n_orders * CAST(total_rev AS DOUBLE)), 6) AS seasonal_index
        |FROM byDow CROSS JOIN tot ORDER BY dow""".stripMargin,

    "q125_fifo_allocation" ->
      """WITH li AS (
        |  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    l_returnflag = 'R' AS is_supply
        |  FROM lineitem),
        |iv AS (
        |  SELECT *,
        |    sum(qty) OVER (PARTITION BY l_partkey, is_supply
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS hi
        |  FROM li),
        |iv2 AS (SELECT *, hi - qty AS lo FROM iv),
        |pairs AS (
        |  SELECT d.l_partkey,
        |    least(d.hi, s.hi) - greatest(d.lo, s.lo) AS units
        |  FROM iv2 d JOIN iv2 s
        |    ON d.l_partkey = s.l_partkey
        |    AND NOT d.is_supply AND s.is_supply
        |    AND d.lo < s.hi AND s.lo < d.hi),
        |perPart AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(units) AS BIGINT) AS matched
        |  FROM pairs GROUP BY 1),
        |tot AS (
        |  SELECT l_partkey,
        |    CAST(sum(CASE WHEN is_supply THEN qty ELSE 0 END) AS BIGINT)
        |      AS supply_units,
        |    CAST(sum(CASE WHEN NOT is_supply THEN qty ELSE 0 END) AS BIGINT)
        |      AS demand_units
        |  FROM li GROUP BY 1),
        |top AS (
        |  SELECT p.l_partkey, p.matched, p.n_pairs, t.demand_units,
        |    t.supply_units
        |  FROM perPart p JOIN tot t USING (l_partkey)
        |  ORDER BY p.matched DESC, p.l_partkey LIMIT 20)
        |SELECT l_partkey, matched, n_pairs, demand_units, supply_units,
        |  round(CAST(matched AS DOUBLE) /
        |    greatest(least(demand_units, supply_units), 1), 6)
        |    AS matched_frac
        |FROM top ORDER BY matched DESC, l_partkey""".stripMargin,
  )
}
