package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the harness testdata directories. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** A clean per-sf fixture dir under java.io.tmpdir for FW-table
    * queries: recreated empty on every call. Deletion is RECURSIVE —
    * fixture tables carry subdirectories (hive partition dirs,
    * materialized change data under `_fw_changes/`).
    */
  def freshFwBase(tag: String, dir: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val base = Paths.get(System.getProperty("java.io.tmpdir"),
      tag, Paths.get(dir).getFileName.toString)
    def nuke(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(nuke)
      f.delete()
    }
    if (Files.exists(base))
      Option(base.toFile.listFiles()).getOrElse(Array.empty).foreach(nuke)
    Files.createDirectories(base)
    base
  }

  /** The events table's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark 4 rejects outright;
    * readable only as nanos-since-epoch longs via the legacy conf),
    * plain TIMESTAMP(MICROS) without the UTC flag (read as
    * TIMESTAMP_NTZ), or an already-zoned TIMESTAMP. Normalize all three
    * to microsecond TimestampType so every downstream query sees ONE
    * schema. The NTZ cast reinterprets wall-clock in the session zone;
    * every entry point (Verify/Bench/tests/CLI) pins UTC, so the
    * instants match DuckDB's zone-naive reading of the same parquet.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** DuckDB replica of the graft.functions.Md5Pack 62-bit hash over SQL
    * expression `e` — shared by every md5-anchored oracle.
    */
  private[queries] def duckMd5Pack(e: String): String =
    s"""((CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT) % 2147483647) * 2147483648
       | + (CAST(concat('0x', substr(md5($e), 16, 15)) AS BIGINT) % 2147483647))""".stripMargin
}
