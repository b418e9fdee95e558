package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 57: backlog conservation, SLA bounds,
  * overlap symmetry coverage.
  */
class Round7oSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q194: backlog never negative and drains to zero at the horizon") {
    val rows = graft.SparkEntry.queries("q194_backlog_curve")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, b) => assert(b >= 0) }
    assert(rows.last._2 == 0, "all orders eventually ship")
    assert(rows.map(_._2).max > 0)
  }

  test("q195: SLA rates in [0,1], counts consistent, all priorities present") {
    val rows = graft.SparkEntry.queries("q195_fulfillment_sla")(spark, Sf)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("t33: 10 unordered language pairs, jaccard in (0,1)") {
    val rows = graft.SparkEntry.queries("t33_vocab_overlap")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    assert(rows.length == 10, s"expected C(5,2) pairs, got ${rows.length}")
    rows.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j > 0.0 && j <= 1.0, s"pair ($a,$b) jaccard $j")
    }
  }
}
