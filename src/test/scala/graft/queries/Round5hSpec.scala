package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q111/q112 batch: the bitmap window equals an
  * exact driver-side rolling distinct, and the jackknife interval is
  * centered, ordered, and near the classical standard error.
  */
class Round5hSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q111: bitmap rolling window equals exact rolling distinct") {
    val rows = q("q111_rolling_distinct").collect()
    assert(rows.nonEmpty)
    val byDay = Tables.t(spark, Sf, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .collect()
      .groupBy(_.getDate(0))
      .map { case (d, rs) => d.toLocalDate -> rs.map(_.getLong(1)).toSet }
    rows.foreach { r =>
      val day = r.getDate(0).toLocalDate
      val exact1 = byDay(day).size.toLong
      val exact7 = (0 to 6).flatMap(k =>
        byDay.getOrElse(day.minusDays(k), Set.empty[Long])).toSet.size.toLong
      assert(r.getLong(1) === exact1, s"$day users_1d")
      assert(r.getLong(2) === exact7, s"$day users_7d")
      assert(r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("q112: interval ordered and centered; SE near the classical one") {
    val r = q("q112_jackknife_ci").collect().head
    val (n, mean, se, lo, hi) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val prices = Tables.t(spark, Sf, "orders")
      .select(col("o_totalprice").cast("double")).collect()
      .map(_.getDouble(0))
    assert(n === prices.length.toLong)
    assert(math.abs(mean - prices.sum / prices.length) < 0.01)
    assert(lo < mean && mean < hi)
    assert(math.abs((hi + lo) / 2.0 - mean) < 1e-4, "interval not centered")
    // jackknife SE of the mean should approximate s/sqrt(n)
    val m = prices.sum / prices.length
    val classical = math.sqrt(
      prices.map(x => (x - m) * (x - m)).sum / (prices.length - 1)
    ) / math.sqrt(prices.length.toDouble)
    assert(se > classical * 0.5 && se < classical * 2.0,
      s"jackknife SE $se vs classical $classical")
  }
}
