package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q134/q135 batch: the Holt recurrence
  * replays bit-for-bit in Scala, and assortativity stays a valid
  * correlation over the recomputed edge count.
  */
class Round5vSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q134: unrolled recurrence replays bit-for-bit; forecasts linear") {
    val r = q("q134_holt_forecast").collect().head
    val xs = Tables.t(spark, Sf, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .orderBy(col("day").desc).limit(10).collect()
      .map(_.getDecimal(1).doubleValue()).reverse // ascending x1..x10
    var l = xs(0); var b = xs(1) - xs(0)
    (1 until 10).foreach { i =>
      val lNew = 0.5 * xs(i) + 0.5 * (l + b)
      b = 0.5 * (lNew - l) + 0.5 * b
      l = lNew
    }
    assert(r.getDouble(0) === xs(9), "last_rev")
    assert(r.getDouble(1) === l, "level must replay bit-for-bit")
    assert(r.getDouble(2) === b, "trend must replay bit-for-bit")
    assert(r.getDouble(3) === l + 1 * b)
    assert(r.getDouble(5) - r.getDouble(4) === r.getDouble(4) -
      r.getDouble(3), "forecasts not linear in h")
  }

  test("q135: valid correlation over the recomputed edge count") {
    val r = q("q135_degree_assortativity").collect().head
    val edges = Tables.t(spark, Sf, "lineitem")
      .join(Tables.t(spark, Sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    assert(r.getLong(0) === edges)
    assert(math.abs(r.getDouble(3)) <= 1.0)
    assert(r.getDouble(1) > 0 && r.getDouble(2) > 0)
  }
}
