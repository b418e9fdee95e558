package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 58: IVF balance invariants and HHI trend
  * coverage.
  */
class Round7pSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("s23: list sizes account for every vector; imbalance >= 1") {
    val r = graft.SparkEntry.queries("s23_ivf_balance")(spark, Sf)
      .collect().head
    val (nLists, nVecs) = (r.getLong(0), r.getLong(1))
    val (mn, mx) = (r.getLong(2), r.getLong(3))
    assert(nLists > 0 && nLists <= 16)
    assert(mn >= 1 && mx >= mn)
    assert(mn * nLists <= nVecs && nVecs <= mx * nLists)
    assert(r.getDouble(4) >= 1.0 - 1e-9, "max/mean imbalance below 1")
    assert(r.getDouble(5) >= 0.0)
  }

  test("q196: every supplier nation gets a trend over multiple years") {
    val rows = graft.SparkEntry.queries("q196_hhi_trend")(spark, Sf)
      .collect()
    // sf0.001 has suppliers in only a subset of nations
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, "trend needs at least two years")
      assert(!r.isNullAt(2))
    }
  }
}
