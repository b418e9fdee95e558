package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink completeness: the engine round-trips its tables through
  * every columnar/text format shipped with this Spark build (parquet, ORC,
  * CSV, JSON-lines) without value drift, and reads opaque payloads via the
  * binaryFile source (the real-ingestion path for graft.mm).
  * (spark-avro is not bundled in this distribution — not exercised.)
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def fingerprint(df: org.apache.spark.sql.DataFrame): BigDecimal = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).first().getDecimal(0)
  }

  test("orders round-trips through parquet, ORC, CSV, JSON unchanged") {
    val orders = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val want = fingerprint(orders)
    val base = Files.createTempDirectory("fmt").toString

    orders.write.mode("overwrite").parquet(s"$base/p")
    assert(fingerprint(spark.read.parquet(s"$base/p")) === want)

    orders.write.mode("overwrite").orc(s"$base/o")
    assert(fingerprint(spark.read.orc(s"$base/o")) === want)

    // Text formats need explicit schema + timestamp format to round-trip.
    val tsFmt = "yyyy-MM-dd HH:mm:ss"
    orders.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", tsFmt).csv(s"$base/c")
    val backCsv = spark.read.schema(orders.schema)
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(s"$base/c")
    assert(fingerprint(backCsv) === want)

    orders.write.mode("overwrite").option("timestampFormat", tsFmt)
      .json(s"$base/j")
    val backJson = spark.read.schema(orders.schema)
      .option("timestampFormat", tsFmt).json(s"$base/j")
    assert(fingerprint(backJson) === want)
  }

  test("binaryFile source reads opaque payloads with metadata") {
    val rows = spark.read.format("binaryFile")
      .load("/root/testdata/sf0.001/documents.parquet")
      .select("path", "length", "content")
      .collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[Array[Byte]]("content").length ===
      rows(0).getLong(1).toInt)
    assert(rows(0).getString(0).endsWith("documents.parquet"))
  }
}
