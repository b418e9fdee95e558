package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 83: fence geometry and burstiness
  * nonnegativity.
  */
class Round8mSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q237: fences ordered, outliers a small minority") {
    val rows = graft.SparkEntry.queries("q237_tukey_fences")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.length == 3)
    rows.foreach { case (n, q1, q3, iqr, lo, hi) =>
      assert(q1 <= q3 && iqr == q3 - q1)
      assert(lo + hi < n / 10)
    }
  }

  test("t42: gaps positive, vmr nonnegative when defined") {
    val rows = graft.SparkEntry.queries("t42_token_burstiness")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1)
      assert(r.getLong(2) >= r.getLong(1)) // gaps are >= 1 each
      if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0.0)
    }
  }
}
