package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 97: intersection bounds and the
  * sync-estimator's dominance property.
  */
class Round9aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q253: intersections in [0,1]; bucket counts bounded by 5") {
    val rows = graft.SparkEntry.queries("q253_histogram_intersection")(
      spark, Sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (y1, y2, nb, hi) =>
      assert(y2 == y1 + 1)
      assert(nb >= 1 && nb <= 5)
      assert(hi >= 0.0 && hi <= 1.0)
    }
  }

  test("m23: best_dot dominates the zero-lag dot") {
    val rows = graft.SparkEntry.queries("m23_av_sync")(spark, Sf)
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lag, best, dot0, inSync) =>
      assert(lag >= -2 && lag <= 2)
      assert(best >= dot0)
      assert(inSync == (lag == 0))
      if (inSync) assert(best == dot0)
    }
  }
}
