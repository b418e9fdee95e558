package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 89: mergeability must actually hold, and
  * the leave-one-out ratio recomputes from its own columns.
  */
class Round8sSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q242: every (type, month) bitmap merges losslessly") {
    val rows = graft.SparkEntry.queries("q242_bitmap_mergeability")(
      spark, Sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (words, mismatch, bits, ok) =>
      assert(ok && mismatch == 0L)
      assert(words >= 1 && bits >= words) // each word has >= 1 bit set
    }
  }

  test("q243: ratio consistent with rev/peer_avg") {
    val rows = graft.SparkEntry.queries("q243_leave_one_out")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (rev, peer, ratio) =>
      assert(peer > 0.0)
      assert(math.abs(ratio - rev / peer) < 0.01 * ratio + 1e-6)
    }
  }
}
