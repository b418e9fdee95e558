package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 49: DiD cell coverage and threshold-sweep
  * monotonicity.
  */
class Round7hSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q188: all four design cells are populated") {
    val r = graft.SparkEntry.queries("q188_diff_in_diff")(spark, Sf)
      .collect().head
    (0 to 3).foreach(i => assert(r.getLong(i) > 0, s"empty cell $i"))
    assert(!r.isNullAt(4))
  }

  test("d35: pair and removal counts decrease as the threshold rises") {
    val rows = graft.SparkEntry.queries("d35_threshold_sweep")(spark, Sf)
      .collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, p1, d1), (_, p2, d2)) =>
        assert(p2 <= p1, "pairs must shrink with threshold")
        assert(d2 <= d1, "removals must shrink with threshold")
      case _ =>
    }
    rows.foreach { case (_, p, d) => assert(d <= p + 1) }
  }
}
