package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 68: the div/mod contracts stated by q213,
  * calendar invariants, and L2-vs-cosine ranking sanity.
  */
class Round7ySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q213: trunc/floor differ only on inexact negative quotients") {
    val rows = graft.SparkEntry.queries("q213_intdiv_semantics")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 50)
    rows.foreach { case (n, d, tdiv, fdiv, m, pm) =>
      assert(tdiv == n / d) // JVM long division truncates — the contract
      assert(fdiv == Math.floorDiv(n, d))
      assert((tdiv == fdiv) == (n % d == 0 || (n < 0) == (d < 0)))
      assert(m == n % d)
      assert(pm == Math.floorMod(n, math.abs(d)))
    }
  }

  test("q214: iso dow in 1..7; week_start is a Monday on or before d") {
    val rows = graft.SparkEntry.queries("q214_calendar_pins")(spark, Sf)
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1),
        r.getDate(2).toLocalDate))
    assert(rows.length == 25)
    rows.foreach { case (d, dow, ws) =>
      assert(dow == d.getDayOfWeek.getValue)
      assert(ws.getDayOfWeek.getValue == 1)
      val gap = java.time.temporal.ChronoUnit.DAYS.between(ws, d)
      assert(gap >= 0 && gap <= 6)
    }
  }

  test("s25: 5 ascending distances per probe") {
    val rows = graft.SparkEntry.queries("s25_l2_topk")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(rows.length == 50)
    rows.groupBy(_._1).foreach { case (_, ps) =>
      val sorted = ps.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to 5))
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq)
      sorted.foreach(p => assert(p._2 >= 0.0))
    }
  }
}
