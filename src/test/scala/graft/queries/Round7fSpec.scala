package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 47: reconciliation adding-up, lattice
  * monotonicity, trend-ratio support floor.
  */
class Round7fSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q183: top-down splits add to the top-level forecast") {
    val rows = graft.SparkEntry.queries("q183_forecast_reconciliation")(
      spark, Sf).collect()
    assert(rows.nonEmpty)
    val tdSum = rows.map(_.getDouble(2)).sum
    // Σ td(n) = last_g · Σf12(n)/g12 = last_g exactly (up to 4dp rounds)
    assert(tdSum > 0)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) - (r.getDouble(1) - r.getDouble(2)))
        < 1e-3)
    }
  }

  test("q184: finer lattice nodes never have fewer groups") {
    val g = graft.SparkEntry.queries("q184_cube_advisor")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g("rf,ls") >= g("rf") && g("rf,ls") >= g("ls"))
    assert(g("rf,sm") >= g("rf") && g("rf,sm") >= g("sm"))
    assert(g("ls,sm") >= g("ls") && g("ls,sm") >= g("sm"))
    assert(g("rf,ls,sm") >= g("rf,ls") && g("rf,ls,sm") >= g("ls,sm"))
  }

  test("q185: every trending part clears the support floor; ratios positive") {
    val rows = graft.SparkEntry.queries("q185_trending_parts")(spark, Sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5)
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getDouble(3) > 0.0)
    }
    val ratios = rows.map(_.getDouble(3))
    assert(ratios.sameElements(ratios.sorted.reverse))
  }
}
