package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 43: correlation bounds, label-propagation
  * closure, HHI range.
  */
class Round7bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q174: correlations bounded, zero-lag pairs every day") {
    val rows = graft.SparkEntry.queries("q174_cross_correlation")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 5)
    rows.foreach { case (_, n, c) =>
      assert(n > 0)
      assert(c >= -1.0 && c <= 1.0)
    }
    val n0 = rows.find(_._1 == 0).get._2
    rows.foreach { case (l, n, _) => assert(n <= n0, s"lag $l has $n > $n0") }
  }

  test("q176: every label is a member node of its own community") {
    val rows = graft.SparkEntry.queries("q176_label_propagation")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 25)
    val nodes = rows.map(_._1).toSet
    rows.foreach { case (_, lab) => assert(nodes.contains(lab)) }
  }

  test("q177: HHI lies in [10000/n, 10000]") {
    val rows = graft.SparkEntry.queries("q177_hhi")(spark, Sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, hhi) =>
      assert(hhi <= 10000.0 + 1e-6)
      assert(hhi >= 10000.0 / n - 1e-6)
    }
  }

  test("q175: bin rates in [0,1]; brier consistent with rates") {
    val rows = graft.SparkEntry.queries("q175_calibration_bins")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
