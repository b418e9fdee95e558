package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 95: the temperature-resampling law. */
class Round8ySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("t48: tempered shares sum to 1 and compress the distribution") {
    val rows = graft.SparkEntry.queries("t48_temperature_sampling")(
      spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-5)
    rows.foreach { case (_, _, p, q, mult, up) =>
      // temperature < 1 pulls shares toward uniform: rare langs gain
      assert(up == (mult > 1.0))
      if (p < rows.map(_._3).max) () // no strict claim per-row
      assert(mult > 0.0)
    }
    // the smallest language must be upsampled, the largest downsampled
    val byP = rows.sortBy(_._3)
    assert(byP.head._5 >= 1.0 - 1e-9)
    assert(byP.last._5 <= 1.0 + 1e-9)
  }
}
