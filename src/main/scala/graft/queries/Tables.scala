package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the harness testdata directories. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 rejects outright; read them as nanos-since-epoch longs (legacy
    * conf) and convert to microsecond TimestampType (lossless here — the
    * generator emits µs-resolution values).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** DuckDB replica of the graft.functions.Md5Pack 62-bit hash over SQL
    * expression `e` — shared by every md5-anchored oracle.
    */
  private[queries] def duckMd5Pack(e: String): String =
    s"""((CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT) % 2147483647) * 2147483648
       | + (CAST(concat('0x', substr(md5($e), 16, 15)) AS BIGINT) % 2147483647))""".stripMargin
}
