package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 80: status-census conservation and the
  * month-end clamping law.
  */
class Round8jSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q233: consistent + violations = orders for every status") {
    val rows = graft.SparkEntry.queries("q233_status_consistency")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet.subsetOf(Set("F", "O", "P")))
    rows.foreach { case (_, n, ok, bad) => assert(ok + bad == n) }
  }

  test("q234: +1 month keeps the day-of-month, clamped DOWN only") {
    val rows = graft.SparkEntry.queries("q234_month_arith_pins")(spark, Sf)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate,
        r.getBoolean(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (me, p1, isEnd, gap) =>
      // the pinned law (both engines agree): day-of-month is preserved,
      // clamped down to the target month's length — NOT re-clamped up
      // to the target month end (Apr 30 + 1M = May 30, not May 31)
      assert(p1 == me.plusMonths(1))
      assert(isEnd == (p1 == p1.withDayOfMonth(p1.lengthOfMonth)))
      assert(gap >= 28 && gap <= 31)
    }
  }
}
