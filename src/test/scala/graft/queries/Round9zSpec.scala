package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 125: the gravity model. */
class Round9zSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q291: coefficients are finite; R2 in [0,1]; mass effect positive") {
    val r = graft.SparkEntry.queries("q291_gravity")(spark, Sf)
      .collect().head
    val (n, bm, bd, b0, r2) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n > 10, "enough nation pairs to fit")
    Seq(bm, bd, b0, r2).foreach(v =>
      assert(!v.isNaN && !v.isInfinite, "finite fit"))
    // Flows genuinely scale with combined mass; coordinates are random,
    // so the distance elasticity should be near zero by construction.
    assert(bm > 0.0, s"mass elasticity $bm should be positive")
    assert(math.abs(bd) < 0.5, s"random-coordinate distance effect $bd")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }
}
