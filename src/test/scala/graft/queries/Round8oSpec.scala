package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 85: the consistent-hashing movement
  * guarantee and lossless channel surgery.
  */
class Round8oSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d44: ring moves a small fraction; mod moves most") {
    val r = graft.SparkEntry.queries("d44_consistent_hash_rebalance")(
      spark, Sf).collect().head
    val (n, ringFrac, modFrac) =
      (r.getLong(0), r.getDouble(3), r.getDouble(4))
    assert(n > 0)
    // guarantee ≈ 1/9 ≈ 0.11 for the ring; mod reshuffles ~8/9
    assert(ringFrac < 0.35, s"ring moved $ringFrac")
    assert(modFrac > 0.6, s"mod moved $modFrac")
    assert(ringFrac < modFrac / 2)
  }

  test("m21: every clip roundtrips lossless with balanced channels") {
    val rows = graft.SparkEntry.queries("m21_channel_roundtrip")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, l, rr, ok) =>
      assert(ok)
      assert(l + rr == n)
      assert(l - rr == n % 2)
    }
  }
}
