package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 114 (SURVEY.md §2.4):
  *
  *  - q271: Mann–Whitney U rank-sum test (urgent vs low-priority order
  *    totals) — the nonparametric two-sample location test. Ranks come
  *    from the per-distinct-value count frame prefix-summed by
  *    [[graft.operators.GlobalPrefixSum]] (never a single-task global
  *    window): for a value with combined count t ending at cumulative
  *    position cum, twice the average rank is the INTEGER
  *    2·cum − t + 1, so the rank sum, U, and the tie-correction term
  *    Σ(t³−t) all stay exact (products in DECIMAL(38,0)); only the
  *    final z-score is a rounded double.
  *  - q272: McNemar paired test — do q264's Markov next-event rule and
  *    the majority-class baseline disagree more than chance allows?
  *    Both classifiers score the SAME held-out transitions (odd-keyed
  *    users; trained on even-keyed), the b/c discordant cells are two
  *    count_ifs on one pass, and the continuity-corrected statistic
  *    (|b−c|−1)²/(b+c) is exact integers until the final division.
  */
object Analytics97 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q271_mann_whitney" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(col("o_totalprice").as("v"),
          (col("o_orderpriority") === "1-URGENT").as("in_a"))
      // One row per distinct value: group sizes and the combined count.
      val byVal = o.groupBy("v").agg(
        count_if(col("in_a")).as("ca"),
        count(lit(1)).as("t"))
      val ranked = graft.operators.GlobalPrefixSum
        .withRunningTotal(byVal, "v", "t", "cum")
      // 2·avgrank = 2·cum − t + 1 (exact integer; ties share the
      // midrank). Rank-sum products ride in DECIMAL(38,0).
      val agg = ranked.agg(
        sum(expr("cast(ca as decimal(38,0)) * (2 * cum - t + 1)"))
          .as("r2a"), // twice the A rank sum
        sum(col("ca")).as("na"),
        sum(col("t") - col("ca")).as("nb"),
        sum(expr("cast(t as decimal(38,0)) * t * t - t")).as("ties"))
      agg.select(
          col("na"), col("nb"),
          // 2U = 2R_A − n_A(n_A+1); halve at the edge (U may end in .5).
          expr("""cast((r2a - cast(na as decimal(38,0)) * (na + 1)) as double)
                 | / 2""".stripMargin).as("u"),
          expr("""round((cast(r2a - cast(na as decimal(38,0)) * (na + 1)
                 |        as double) / 2
                 |  - cast(na as double) * nb / 2)
                 | / sqrt(cast(na as double) * nb / 12
                 |    * ((na + nb + 1)
                 |       - cast(ties as double)
                 |         / (cast(na + nb as double) * (na + nb - 1)))),
                 | 6)""".stripMargin).as("z"))
    }),

    "q272_mcnemar" -> ((spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next"))
        .withColumn("prev", lag(col("next"), 1).over(w))
        .filter(col("prev").isNotNull)
        .localCheckpoint(true) // feeds train (rule + majority) and test
      val train = trans.filter(col("user_id") % 2 === 0)
      val rule = train
        .groupBy("prev", "next").agg(count(lit(1)).as("c"))
        .groupBy("prev")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("c")).as("nc"), col("next").as("p")), 1).as("w"))
        .select(col("prev"), col("w")(0)("p").as("rule_pred"))
      val majority = train
        .groupBy("next").agg(count(lit(1)).as("c"))
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("c")).as("nc"), col("next").as("p")), 1).as("w"))
        .select(col("w")(0)("p").as("base_pred"))
      trans.filter(col("user_id") % 2 === 1)
        .join(broadcast(rule), "prev")
        .crossJoin(broadcast(majority))
        .agg(
          count(lit(1)).as("n_test"),
          count_if(col("rule_pred") === col("next")
            && col("base_pred") =!= col("next")).as("b"),
          count_if(col("rule_pred") =!= col("next")
            && col("base_pred") === col("next")).as("c"))
        .select(col("n_test"), col("b"), col("c"),
          round(
            (abs(col("b") - col("c")) - 1)
              * (abs(col("b") - col("c")) - 1)
              / (col("b") + col("c")).cast("double"), 6).as("mcnemar"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q271_mann_whitney" -> """
      WITH o AS (
        SELECT o_totalprice AS v,
          (o_orderpriority = '1-URGENT') AS in_a
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      byval AS (
        SELECT v,
          CAST(count(*) FILTER (WHERE in_a) AS BIGINT) AS ca,
          CAST(count(*) AS BIGINT) AS t
        FROM o GROUP BY v),
      ranked AS (
        SELECT ca, t, CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cum
        FROM byval),
      agg AS (
        SELECT
          sum(CAST(ca AS HUGEINT) * (2 * cum - t + 1)) AS r2a,
          CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(t - ca) AS BIGINT) AS nb,
          sum(CAST(t AS HUGEINT) * t * t - t) AS ties
        FROM ranked)
      SELECT na, nb,
        CAST((r2a - CAST(na AS HUGEINT) * (na + 1)) AS DOUBLE)
          / 2 AS u,
        round((CAST(r2a - CAST(na AS HUGEINT) * (na + 1)
                 AS DOUBLE) / 2
            - CAST(na AS DOUBLE) * nb / 2)
          / sqrt(CAST(na AS DOUBLE) * nb / 12
             * ((na + nb + 1)
                - CAST(ties AS DOUBLE)
                  / (CAST(na + nb AS DOUBLE) * (na + nb - 1)))),
          6) AS z
      FROM agg""",

    "q272_mcnemar" -> """
      WITH seq AS (
        SELECT user_id, event_type AS next,
          lag(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events),
      trans AS (SELECT * FROM seq WHERE prev IS NOT NULL),
      train AS (SELECT * FROM trans WHERE user_id % 2 = 0),
      rule AS (
        SELECT prev, next AS rule_pred FROM (
          SELECT prev, next, count(*) AS c,
            row_number() OVER (PARTITION BY prev
              ORDER BY count(*) DESC, next) AS rn
          FROM train GROUP BY prev, next)
        WHERE rn = 1),
      majority AS (
        SELECT next AS base_pred FROM train
        GROUP BY next ORDER BY count(*) DESC, next LIMIT 1),
      scored AS (
        SELECT t.next, r.rule_pred, m.base_pred
        FROM trans t JOIN rule r USING (prev), majority m
        WHERE t.user_id % 2 = 1),
      cells AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
          CAST(count(*) FILTER (WHERE rule_pred = next
            AND base_pred <> next) AS BIGINT) AS b,
          CAST(count(*) FILTER (WHERE rule_pred <> next
            AND base_pred = next) AS BIGINT) AS c
        FROM scored)
      SELECT n_test, b, c,
        round((abs(b - c) - 1) * (abs(b - c) - 1)
          / CAST(b + c AS DOUBLE), 6) AS mcnemar
      FROM cells""",
  )
}
