package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 82: anomaly-flag sanity and the
  * low-discrepancy property of the interleave.
  */
class Round8lSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q236: flagged days truly exceed 2 sigma; not the whole grid") {
    val flagged = graft.SparkEntry.queries("q236_seasonal_anomalies")(
      spark, Sf).collect()
    val allDays = Tables.t(spark, Sf, "orders")
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(flagged.length < allDays / 2)
    flagged.foreach(r => assert(math.abs(r.getDouble(4)) > 2.0))
  }

  test("d42: head of the stream mixes sources near their corpus shares") {
    val rows = graft.SparkEntry.queries("d42_mix_order")(spark, Sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(2), r.getDouble(3)))
    assert(rows.length == 100)
    assert(rows.map(_._1).toSeq == (1 to 100))
    // keys are nondecreasing along the stream
    val keys = rows.map(_._3).toSeq
    assert(keys == keys.sorted)
    // every source contributes within a loose band of its share
    val total = Tables.t(spark, Sf, "documents").count().toDouble
    val shares = Tables.t(spark, Sf, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val headCounts = rows.groupBy(_._2).view.mapValues(_.length).toMap
    shares.foreach { case (src, n) =>
      val expected = 100.0 * n / total
      val got = headCounts.getOrElse(src, 0).toDouble
      assert(math.abs(got - expected) <= math.max(3.0, expected * 0.75),
        s"source $src expected ~$expected got $got")
    }
  }
}
