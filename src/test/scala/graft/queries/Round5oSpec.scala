package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q123/q124/q125 batch: the CUSUM argmax
  * replays against an independent exact recomputation, the seasonal
  * index conserves revenue, and FIFO allocation equals min(D,S).
  */
class Round5oSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q123: scaled dev replays exactly; argmax is the max") {
    val r = q("q123_cusum_changepoint").collect().head
    val (nDays, cpK) = (r.getLong(1), r.getLong(2))
    val maxDev = r.getDouble(3)
    val daily = Tables.t(spark, Sf, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .orderBy("day").collect()
      .map(x => x.getDate(0) -> BigDecimal(x.getDecimal(1)))
    assert(nDays === daily.length.toLong)
    val total = daily.map(_._2).sum
    val devs = daily.scanLeft(BigDecimal(0))(_ + _._2).tail.zipWithIndex
      .map { case (cusum, i) =>
        (cusum * nDays - total * (i + 1)).abs
      }
    assert(maxDev === devs.max.toDouble)
    assert(devs(cpK.toInt - 1) === devs.max)
    assert(devs.indexOf(devs.max) === cpK.toInt - 1, "not the earliest argmax")
    assert(r.getDouble(4) !== r.getDouble(5), "flat series flagged")
  }

  test("q124: revenue conserved across DOWs; indexes average to ~1") {
    val rows = q("q124_seasonal_index").collect()
    assert(rows.length === 7)
    assert(rows.map(_.getInt(0)).toSeq === (0 to 6))
    val nOrders = Tables.t(spark, Sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum === nOrders)
    rows.foreach(r => assert(r.getDouble(4) > 0.0))
    // weighted mean of indexes is 1 by construction
    val weighted = rows.map(r => r.getDouble(4) * r.getLong(1)).sum / nOrders
    assert(math.abs(weighted - 1.0) < 1e-4)
  }

  test("q125: FIFO matched units equal min(demand, supply)") {
    val rows = q("q125_fifo_allocation").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val matched = rows.map(_.getLong(1))
    assert(matched.sameElements(matched.sorted.reverse))
    rows.foreach { r =>
      val (m, np, du, su) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m === math.min(du, su),
        s"part ${r.getLong(0)}: FIFO total != min(D,S)")
      assert(np >= 1)
      assert(r.getDouble(5) === 1.0)
    }
  }
}
