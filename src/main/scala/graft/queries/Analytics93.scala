package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 110 (SURVEY.md §2.4):
  *
  *  - q263: greedy set cover for source selection — the data-sourcing
  *    planner: which 5 sources together cover the most distinct token
  *    bigrams? Each of the 5 unrolled greedy rounds anti-joins the
  *    remaining universe against the covered set, counts per-source
  *    gain (map-side combinable), and arg-maxes with the bounded min-k
  *    aggregate (gain desc, source asc tie) — the covered set stays a
  *    distributed frame, never a driver collection. Classic (1−1/e)
  *    greedy guarantee, fully deterministic.
  *  - q264: Markov next-event prediction accuracy — the held-out eval
  *    for q82's transition matrix: train the argmax next-event rule on
  *    even-keyed users' adjacent transitions, score it on odd-keyed
  *    users. Per-user lag windows only (bounded partitions), one
  *    broadcast of the 5×5 rule table.
  */
object Analytics93 {
  import Tables.t

  private val CoverRounds = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q263_set_cover" -> ((spark, dir) => {
      val st = t(spark, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(tk) - 2), i -> " +
            "concat(tk[i], ' ', tk[i + 1]))")).as("bg"))
        .distinct()
        .localCheckpoint(true) // scanned once per greedy round
      val uni = st.agg(countDistinct(col("bg")).as("u"))
      var covered = st.select(col("bg")).filter(lit(false))
        .localCheckpoint(true)
      var out: DataFrame = null
      for (r <- 1 to CoverRounds) {
        val gains = st.join(covered, Seq("bg"), "left_anti")
          .groupBy("source").agg(count(lit(1)).as("g"))
        // Once the universe is covered the gains frame is empty: the
        // global agg still emits one row whose top-k array is [], so
        // index via get() (null, not ANSI INVALID_ARRAY_INDEX) and drop
        // the degenerate round — matching the oracle, whose `LIMIT 1`
        // over an empty gains CTE likewise emits no row for the round.
        val pick = gains
          .agg(graft.functions.TopKAgg.minK(
            struct((-col("g")).as("ng"), col("source").as("s")), 1)
            .as("w"))
          .select(get(col("w"), lit(0)).as("w0"))
          .select(col("w0")("s").as("source"), (-col("w0")("ng")).as("gain"))
          .filter(col("source").isNotNull)
        covered = covered
          .union(st.join(broadcast(pick.select("source")), "source")
            .select("bg"))
          .distinct()
          .localCheckpoint(true)
        val row = pick.crossJoin(broadcast(covered.agg(
            count(lit(1)).as("cum_covered"))))
          .crossJoin(broadcast(uni))
          .select(lit(r).as("round"), col("source"), col("gain"),
            col("cum_covered"),
            round(col("cum_covered").cast("double")
              / col("u").cast("double"), 6).as("share"))
        out = if (out == null) row else out.union(row)
      }
      out.orderBy("round")
    }),

    "q264_markov_accuracy" -> ((spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next"))
        .withColumn("prev", lag(col("next"), 1).over(w))
        .filter(col("prev").isNotNull)
        .localCheckpoint(true) // feeds both the train and test splits
      val rule = trans.filter(col("user_id") % 2 === 0)
        .groupBy("prev", "next").agg(count(lit(1)).as("c"))
        .groupBy("prev")
        .agg(graft.functions.TopKAgg.minK(
          struct((-col("c")).as("nc"), col("next").as("p")), 1).as("w"))
        .select(col("prev"), col("w")(0)("p").as("predicted"))
      trans.filter(col("user_id") % 2 === 1)
        .join(broadcast(rule), "prev")
        .groupBy(col("prev"), col("predicted"))
        .agg(count(lit(1)).as("n_test"),
          count_if(col("next") === col("predicted")).as("n_correct"))
        .select(col("prev"), col("predicted"), col("n_test"),
          col("n_correct"),
          round(col("n_correct").cast("double")
            / col("n_test").cast("double"), 6).as("accuracy"))
        .orderBy("prev")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q263_set_cover" -> {
      val rounds = (1 to CoverRounds).map { r =>
        s"""gain$r AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS g
           |  FROM st ANTI JOIN cov${r - 1} USING (bg)
           |  GROUP BY source),
           |pick$r AS (SELECT source, g FROM gain$r
           |           ORDER BY g DESC, source LIMIT 1),
           |cov$r AS MATERIALIZED (
           |  SELECT bg FROM cov${r - 1}
           |  UNION
           |  SELECT bg FROM st SEMI JOIN pick$r USING (source))"""
          .stripMargin
      }.mkString(",\n")
      val rows = (1 to CoverRounds).map { r =>
        s"""SELECT $r AS round, source, g AS gain,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cov$r) AS cum_covered,
           |  round((SELECT CAST(count(*) AS DOUBLE) FROM cov$r)
           |    / (SELECT CAST(count(DISTINCT bg) AS DOUBLE) FROM st), 6)
           |    AS share
           |FROM pick$r""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (
         |  SELECT source, string_split(text, ' ') AS tk
         |  FROM documents WHERE text IS NOT NULL),
         |st AS MATERIALIZED (
         |  SELECT DISTINCT source, bg FROM (
         |    SELECT source,
         |      unnest(list_transform(range(len(tk) - 1),
         |        i -> tk[i + 1] || ' ' || tk[i + 2])) AS bg
         |    FROM d WHERE len(tk) >= 2)),
         |cov0 AS (SELECT bg FROM st WHERE false),
         |$rounds
         |$rows
         |ORDER BY round""".stripMargin
    },

    "q264_markov_accuracy" ->
      """WITH tr AS MATERIALIZED (
        |  SELECT user_id, event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |tt AS (SELECT * FROM tr WHERE prev IS NOT NULL),
        |rule AS (
        |  SELECT prev, next AS predicted FROM (
        |    SELECT prev, next, count(*) AS c,
        |      row_number() OVER (PARTITION BY prev
        |        ORDER BY count(*) DESC, next) AS rn
        |    FROM tt WHERE user_id % 2 = 0 GROUP BY prev, next)
        |  WHERE rn = 1)
        |SELECT prev, predicted, CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(count(*) FILTER (next = predicted) AS BIGINT) AS n_correct,
        |  round(CAST(count(*) FILTER (next = predicted) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS accuracy
        |FROM tt JOIN rule USING (prev)
        |WHERE user_id % 2 = 1
        |GROUP BY prev, predicted
        |ORDER BY prev""".stripMargin,
  )
}
