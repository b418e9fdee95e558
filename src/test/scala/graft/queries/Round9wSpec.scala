package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 122: conformance and watermark audits. */
class Round9wSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q285: classes partition the users; shares sum to one") {
    val rows = graft.SparkEntry.queries("q285_conformance")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val valid = Set("conformant", "no_purchase", "no_signup_before",
      "error_blocked")
    assert(rows.map(_._1).toSet.subsetOf(valid))
    val nUsers = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === nUsers, "every user classified once")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
  }

  test("q286: lateness stats are internally consistent") {
    val r = graft.SparkEntry.queries("q286_watermark_audit")(spark, Sf)
      .collect().head
    val (n, nLate, share, maxS, p99m) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getLong(3), r.getLong(4))
    assert(n > 0 && nLate >= 0 && nLate <= n)
    assert(math.abs(share - nLate.toDouble / n) < 1e-5)
    assert(maxS >= 0)
    assert(p99m >= 0 && p99m * 60 <= maxS + 60,
      "p99 minute bucket cannot exceed the max lateness")
  }

  test("withRunningMax equals the single-window formulation") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 2L), (5L, 9L),
      (6L, 1L), (7L, 10L)).toDF("k", "v")
    val got = graft.operators.GlobalPrefixSum
      .withRunningMax(df, "k", "v", "m", partitions = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expect = df.withColumn("m", max(col("v")).over(
        org.apache.spark.sql.expressions.Window.orderBy("k")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(expect === Map(1L -> 5L, 2L -> 5L, 3L -> 9L, 4L -> 9L,
      5L -> 9L, 6L -> 9L, 7L -> 10L))
  }
}
