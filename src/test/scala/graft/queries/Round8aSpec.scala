package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 71: exact-sum allocation, date-spine
  * continuity, and the sketch-vs-exact error bound.
  */
class Round8aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q219: allocations sum exactly to the budget; deltas are 0/1") {
    val rows = graft.SparkEntry.queries("q219_budget_allocation")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum == 10000000L)
    rows.foreach { case (fl, al, got) =>
      assert(al - fl == (if (got) 1L else 0L))
    }
  }

  test("q220: spine is gapless and dow cycles mod 7") {
    val rows = graft.SparkEntry.queries("q220_date_dim")(spark, Sf)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1)))
    assert(rows.length > 300)
    rows.sliding(2).foreach {
      case Array((d1, w1), (d2, w2)) =>
        assert(d1.plusDays(1) == d2)
        assert(w2 == (w1 % 7) + 1)
      case _ => ()
    }
  }

  test("d41: estimate is k/8 and the MAE is sane for >=0.5 pairs") {
    val rows = graft.SparkEntry.queries("d41_minhash_error")(spark, Sf)
      .collect()
      .map(r => (r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, est, err) =>
      assert(k >= 0 && k <= 8)
      assert(math.abs(est - k / 8.0) < 1e-9)
      assert(err >= 0.0 && err <= 1.0)
    }
    // on verified >=0.5-Jaccard pairs the 8-hash sketch should not be
    // wildly off on average
    val mae = rows.map(_._3).sum / rows.length
    assert(mae < 0.35)
  }
}
