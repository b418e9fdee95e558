package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 126: grouped regression. */
class Round10aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q292: one model per brand; R2 in [0,1]; fits are finite") {
    val rows = graft.SparkEntry.queries("q292_grouped_regression")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (_, n, b1, b0, r2) =>
      assert(n > 0)
      Seq(b1, b0, r2).foreach(v => assert(!v.isNaN && !v.isInfinite))
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
      // intercept ~ mean ln(quantity): quantities are 1..50, so e^b0
      // must land inside that range comfortably.
      assert(b0 > 0.0 && b0 < math.log(50.0) + 0.5)
    }
  }
}
