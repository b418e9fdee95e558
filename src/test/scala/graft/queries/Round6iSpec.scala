package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q155/q156 batch: RFM scores are balanced
  * quintiles covering every customer, and backtest errors replay from
  * the sequential daily series.
  */
class Round6iSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q155: segments cover all customers; scores are 1..5 quintiles") {
    val rows = q("q155_rfm_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nCust = Tables.t(spark, Sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._4).sum === nCust)
    rows.foreach { case (r, f, m, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // each dimension's marginal is an exact quintile split: the rank
    // formula puts ⌈n/5⌉-or-⌊n/5⌋ customers in each score
    def marginal(idx: Int) = rows.groupBy {
      case (r, f, m, _) => Seq(r, f, m)(idx)
    }.map { case (k, g) => k -> g.map(_._4).sum }
    (0 to 2).foreach { dim =>
      val sizes = marginal(dim).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"dim $dim quintiles $sizes")
    }
  }

  test("q156: MAE/bias replay from the sequential daily series") {
    val rows = q("q156_forecast_backtest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq("naive_lag1", "seasonal_lag7"))
    val daily = Tables.t(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("rev"))
      .orderBy("d").collect().map(_.getLong(1))
    def check(lagN: Int, row: (String, Long, Double, Double)): Unit = {
      val pairs = daily.drop(lagN).zip(daily.dropRight(lagN))
      assert(row._2 === pairs.length.toLong)
      val mae = pairs.map(p => math.abs(p._1 - p._2)).map(BigInt(_)).sum
      val bias = pairs.map(p => BigInt(p._1 - p._2)).sum
      assert(math.abs(row._3 - mae.toDouble / pairs.length) < 1e-5)
      assert(math.abs(row._4 - bias.toDouble / pairs.length) < 1e-5)
    }
    check(1, rows(0)); check(7, rows(1))
    // lag-1 should beat lag-7 on MAE only if the series has short-range
    // structure; both must at least be positive
    rows.foreach(r => assert(r._3 > 0.0))
  }
}
