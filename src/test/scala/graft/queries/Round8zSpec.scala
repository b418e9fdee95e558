package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 96: CUPED reduces variance as promised and
  * winsorized means sit inside the fence values.
  */
class Round8zSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q251: variance reduction in [0,1); theta finite") {
    val r = graft.SparkEntry.queries("q251_cuped")(spark, Sf)
      .collect().head
    val (n, theta, vr) = (r.getLong(0), r.getDouble(1), r.getDouble(4))
    assert(n > 0)
    assert(!theta.isNaN && !theta.isInfinite)
    // CUPED can't hurt: reduction equals corr², so it's within [0, 1)
    assert(vr >= -1e-9 && vr < 1.0)
  }

  test("q252: winsorized mean lies within [p5, p95]") {
    val rows = graft.SparkEntry.queries("q252_winsorized_mean")(spark, Sf)
      .collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getDouble(5)))
    assert(rows.length == 3)
    rows.foreach { case (p5, p95, m) =>
      assert(p5 <= p95)
      assert(m >= p5.toDouble - 1e-6 && m <= p95.toDouble + 1e-6)
    }
  }
}
