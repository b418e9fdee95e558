package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 54: remediation math, DQ counters,
  * cross-media frame groups.
  */
class Round7mSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q192: the planted hot key is flagged with a leveling salt") {
    val rows = graft.SparkEntry.queries("q192_skew_remediation")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    val hot = rows.find(_.getString(0) == "hot")
    assert(hot.isDefined, "hot key not flagged")
    hot.foreach { r =>
      assert(r.getDouble(2) > 2.0)
      assert(r.getLong(3) >= 2, "salt must split the hot key")
    }
  }

  test("q193: duplicate-order counters are mutually consistent") {
    val r = graft.SparkEntry.queries("q193_duplicate_invoices")(spark, Sf)
      .collect().head
    val (g, o, m) = (r.getLong(0), r.getLong(1), r.getLong(2))
    if (g == 0) assert(o == 0 && m == 0)
    else {
      assert(o >= 2 * g)
      assert(m >= 2 && m <= o)
    }
  }

  test("m17: every dedup group spans at least two media") {
    val rows = graft.SparkEntry.queries("m17_frame_dedup")(spark, Sf)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 2)
      assert(r.getLong(1) >= r.getLong(2))
    }
  }
}
