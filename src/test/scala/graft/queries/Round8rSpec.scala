package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 88: interval frame width and payload
  * shape.
  */
class Round8rSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q240: frame never exceeds 7 days and rolling >= daily") {
    val rows = graft.SparkEntry.queries("q240_interval_range_frame")(
      spark, Sf).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (n7, daysIn) =>
      assert(daysIn >= 1 && daysIn <= 7)
      assert(n7 >= 1)
    }
  }

  test("q241: payloads are compact JSON arrays of <=3 suppliers") {
    val rows = graft.SparkEntry.queries("q241_json_payload")(spark, Sf)
      .collect()
      .map(r => r.getString(1))
    assert(rows.nonEmpty)
    rows.foreach { p =>
      assert(p.startsWith("[{\"supplier\":"))
      assert(p.contains("\"revenue_cents\":"))
      assert(!p.contains(" ")) // compact serialization both engines
      assert(p.split("\\},\\{").length <= 3)
    }
  }
}
