package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions, batch 73 (SURVEY.md §2.4):
  *
  *  - q222: CSV hostile-string roundtrip — the writer/reader parity
  *    pin for the nastiest CSV content: embedded commas, double
  *    quotes, and literal newlines inside quoted fields. The engine
  *    WRITES the frame to CSV (quoted, escaped-by-doubling) and reads
  *    it back with multiLine parsing; the oracle recomputes the same
  *    strings straight from the table — a hash match proves the
  *    roundtrip byte-lossless (the q55 ORC pattern, aimed at the far
  *    pointier CSV edge cases).
  *  - q223: arrival-order lateness audit — the batch replay of
  *    watermark semantics: within each user's stream, arrival order is
  *    a DETERMINISTIC md5 shuffle of the event ids (the testdata's ids
  *    are time-ordered, so the shuffle simulates network-disordered
  *    ingest); an event is LATE if its event time sits more than 1
  *    hour behind the running max already "arrived". One window pass
  *    partitioned by user — bounded groups, the exact shape the
  *    streaming dedup/watermark operators reason about, with no
  *    global sort anywhere.
  */
object Analytics66 {
  import Tables.t

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q222_csv_roundtrip" -> ((spark, dir) => {
      val hostile = t(spark, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          concat(lit("a,\"b\"\n"), substring(col("text"), 1, 40),
            lit("\",end")).as("s"))
      val out = java.nio.file.Files
        .createTempDirectory("graft_csv_rt").toString
      hostile.coalesce(1).write.mode("overwrite")
        .option("quoteAll", "true")
        .option("escape", "\"")
        .option("header", "true")
        .csv(out)
      spark.read
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", "\"")
        .schema("doc_id BIGINT, s STRING")
        .csv(out)
        .select(col("doc_id"), col("s"), length(col("s")).as("n_chars"))
        .orderBy("doc_id")
    }),

    "q223_arrival_lateness" -> ((spark, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("arrival"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          graft.functions.Md5Pack(col("event_id").cast("string"))
            .as("arrival"))
        .withColumn("hwm", max(unix_micros(col("ts"))).over(w))
        .withColumn("late", col("hwm").isNotNull
          && unix_micros(col("ts")) < col("hwm") - 3600000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          count_if(col("late")).as("n_late"))
        .filter(col("n_late") > 0)
        .orderBy("user_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q222_csv_roundtrip" ->
      """SELECT doc_id,
        |  concat('a,"b"', chr(10), substr(text, 1, 40), '",end') AS s,
        |  CAST(length(concat('a,"b"', chr(10), substr(text, 1, 40), '",end'))
        |    AS INTEGER) AS n_chars
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id""".stripMargin,

    "q223_arrival_lateness" ->
s"""WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    max(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ${Tables.duckMd5Pack("CAST(event_id AS VARCHAR)")},
        |        event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) FILTER (hwm IS NOT NULL
        |    AND tus < hwm - 3600000000) AS BIGINT) AS n_late
        |FROM x GROUP BY 1
        |HAVING CAST(count(*) FILTER (hwm IS NOT NULL
        |  AND tus < hwm - 3600000000) AS BIGINT) > 0
        |ORDER BY user_id""".stripMargin,
  )
}
