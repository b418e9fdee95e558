package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 73: CSV hostile roundtrip content and the
  * shuffled-arrival lateness bounds.
  */
class Round8cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q222: roundtripped strings keep commas, quotes, and the newline") {
    val rows = graft.SparkEntry.queries("q222_csv_roundtrip")(spark, Sf)
      .collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val s = r.getString(1)
      assert(s.startsWith("a,\"b\"\n"))
      assert(s.endsWith("\",end"))
      assert(r.getInt(2) == s.length)
    }
  }

  test("q223: late counts bounded by event counts; shuffle surfaces lateness") {
    val rows = graft.SparkEntry.queries("q223_arrival_lateness")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // the md5 shuffle disorders a time-ordered stream, so SOME user
    // must see >1h-late events at this sf
    assert(rows.nonEmpty)
    rows.foreach { case (n, late) =>
      assert(late >= 1 && late < n)
    }
  }
}
