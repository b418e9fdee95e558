package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the q132/q133 batch: MI totals conserve and
  * stay non-negative, and the survival curve is a proper monotone
  * tail distribution.
  */
class Round5uSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q132: counts conserve; total MI non-negative and replays") {
    val rows = q("q132_mutual_information").collect()
    val (total, cells) = rows.partition(_.getString(0) == "_total")
    assert(total.length === 1)
    val nOrders = Tables.t(spark, Sf, "orders").count()
    assert(total.head.getLong(2) === nOrders)
    assert(cells.map(_.getLong(2)).sum === nOrders)
    assert(total.head.getDouble(3) >= -1e-9, "MI cannot be negative")
    val replayed = cells.map(r => BigDecimal(r.getDouble(3))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(total.head.getDouble(3) - replayed) < 1e-12)
  }

  test("q133: survival is a monotone tail distribution") {
    val rows = q("q133_survival_curve").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 8L).map(_ * 7))
    val nGaps = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) === nGaps))
    val surv = rows.map(_.getDouble(3))
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b },
      "survival must be non-increasing")
    rows.foreach { r =>
      assert(r.getLong(2) <= nGaps)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
