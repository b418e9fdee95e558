package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 86: the water-filling invariants. */
class Round8pSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q239: allocations sum to capacity; max-min structure holds") {
    val rows = graft.SparkEntry.queries("q239_maxmin_fairshare")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getBoolean(3)))
    assert(rows.length >= 2)
    val cap = rows.map(_._2).sum / 2
    assert(rows.map(_._3).sum == cap)
    rows.foreach { case (_, d, a, sat) =>
      assert(a <= d)
      assert(sat == (a == d))
    }
    // unsaturated allocations differ by at most one cent (flat water)
    val unsat = rows.filter(!_._4).map(_._3)
    if (unsat.nonEmpty) {
      assert(unsat.max - unsat.min <= 1)
      // every saturated demand sits at or below the water level
      val level = unsat.min
      rows.filter(_._4).foreach { case (_, d, _, _) =>
        assert(d <= level + 1)
      }
    }
  }
}
