package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape — the
  * streaming analogue of the batch event queries (q11/q13). The reference is
  * strictly batch (SURVEY.md §2.2), so this is north-star extension surface:
  * `readStream` → watermark → windowed/session aggregation, designed so the
  * same transform functions serve both batch DataFrames and streams
  * (unifying the two is the idiomatic Spark pattern).
  */
object EventStream {

  /** Raw file schema: ts arrives as TIMESTAMP(NANOS) parquet, which Spark 4
    * only reads as nanos-since-epoch long (legacy conf) — see Tables.events.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Streaming read of event parquet files landing in `dir`. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour counts + sums per event type; 1-hour watermark bounds
    * state and drops late data. Works on both batch and streaming frames
    * (watermark is a no-op in batch).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization with Spark's native session_window — state is
    * per (user, open session), closed by the 30-min gap + watermark.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
