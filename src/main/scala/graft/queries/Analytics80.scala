package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 89 (SURVEY.md §2.4):
  *
  *  - q242: bitmap mergeability proof — THE property that makes a
  *    sketch worth shipping at scale: building each (type, month)
  *    bitmap by OR-merging the DAILY bitmaps must equal building it
  *    directly from the raw rows. Both paths run (same 62-bit word
  *    layout as q212), compare word-for-word, and report per (type,
  *    month) equality plus the bit population — a rollup pipeline can
  *    therefore pre-aggregate daily and merge upward without ever
  *    touching raw data again.
  *  - q243: leave-one-out window comparison — each day's revenue
  *    against the average of the OTHER days in its trailing 7-day
  *    frame (Spark has no EXCLUDE CURRENT ROW; the subtraction
  *    emulation is the portable form): ratio > 1 days are local
  *    spikes. Exact DECIMAL sums; one float ratio per row.
  */
object Analytics80 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q242_bitmap_mergeability" -> ((spark, dir) => {
      val M = 4092
      val ev = t(spark, dir, "events")
        .select(col("event_type"),
          (year(col("ts")) * 100 + month(col("ts"))).as("mk"),
          to_date(col("ts")).as("day"),
          pmod(graft.functions.Md5Pack(col("user_id").cast("string")),
            lit(M)).as("h"))
        .select(col("event_type"), col("mk"), col("day"),
          (col("h") / 62).cast("long").as("word"),
          (col("h") % 62).cast("int").as("bit"))
      val daily = ev.groupBy("event_type", "mk", "day", "word")
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("m"))
      val merged = daily.groupBy("event_type", "mk", "word")
        .agg(bit_or(col("m")).as("m_merged"))
      val direct = ev.groupBy("event_type", "mk", "word")
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("m_direct"))
      merged.join(direct, Seq("event_type", "mk", "word"))
        .groupBy("event_type", "mk")
        .agg(count(lit(1)).as("n_words"),
          count_if(col("m_merged") =!= col("m_direct")).as("n_mismatch"),
          sum(bit_count(col("m_direct")).cast("long")).as("n_bits_set"))
        .withColumn("mergeable", col("n_mismatch") === 0)
        .orderBy("event_type", "mk")
    }),

    "q243_leave_one_out" -> ((spark, dir) => {
      val daily = t(spark, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)")).cast("decimal(38,0)").as("rev"))
        .withColumn("x",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      val w = Window.orderBy(col("x")).rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("sum7", sum(col("rev")).over(w).cast("decimal(38,0)"))
        .withColumn("days7", count(lit(1)).over(w))
        .filter(col("days7") >= 2)
        .select(col("day"), col("rev").cast("long").as("rev"),
          round((col("sum7") - col("rev")).cast("double")
            / (col("days7") - 1).cast("double"), 4).as("peer_avg"),
          round(col("rev").cast("double")
            / ((col("sum7") - col("rev")).cast("double")
              / (col("days7") - 1).cast("double")), 6).as("ratio"))
        .orderBy("day")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q242_bitmap_mergeability" -> {
      val h = Tables.duckMd5Pack("CAST(user_id AS VARCHAR)")
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(year(ts) * 100 + month(ts) AS INTEGER) AS mk,
         |    CAST(ts AS DATE) AS day,
         |    (($h) % 4092) // 62 AS word,
         |    CAST((($h) % 4092) % 62 AS INTEGER) AS bit
         |  FROM events),
         |daily AS (
         |  SELECT event_type, mk, day, word,
         |    bit_or(CAST(1 AS BIGINT) << bit) AS m
         |  FROM ev GROUP BY 1, 2, 3, 4),
         |merged AS (
         |  SELECT event_type, mk, word, bit_or(m) AS m_merged
         |  FROM daily GROUP BY 1, 2, 3),
         |direct AS (
         |  SELECT event_type, mk, word,
         |    bit_or(CAST(1 AS BIGINT) << bit) AS m_direct
         |  FROM ev GROUP BY 1, 2, 3)
         |SELECT event_type, mk, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(count(*) FILTER (m_merged <> m_direct) AS BIGINT)
         |    AS n_mismatch,
         |  CAST(sum(bit_count(m_direct)) AS BIGINT) AS n_bits_set,
         |  count(*) FILTER (m_merged <> m_direct) = 0 AS mergeable
         |FROM merged JOIN direct USING (event_type, mk, word)
         |GROUP BY 1, 2 ORDER BY event_type, mk""".stripMargin
    },

    "q243_leave_one_out" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS rev,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS x
        |  FROM lineitem GROUP BY 1, 3),
        |m AS (
        |  SELECT day, rev,
        |    CAST(sum(rev) OVER w AS DECIMAL(38,0)) AS sum7,
        |    CAST(count(*) OVER w AS BIGINT) AS days7
        |  FROM daily
        |  WINDOW w AS (ORDER BY x RANGE BETWEEN 6 PRECEDING
        |    AND CURRENT ROW))
        |SELECT day, CAST(rev AS BIGINT) AS rev,
        |  round(CAST(sum7 - rev AS DOUBLE) / CAST(days7 - 1 AS DOUBLE), 4)
        |    AS peer_avg,
        |  round(CAST(rev AS DOUBLE)
        |    / (CAST(sum7 - rev AS DOUBLE) / CAST(days7 - 1 AS DOUBLE)), 6)
        |    AS ratio
        |FROM m WHERE days7 >= 2
        |ORDER BY day""".stripMargin,
  )
}
