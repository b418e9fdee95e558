package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 84: RAKE score floor and the dynamic
  * pivot's discovered column set.
  */
class Round8nSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("t43: scores >= 1 (degree counts each occurrence at least once)") {
    val rows = graft.SparkEntry.queries("t43_rake_keywords")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    rows.foreach { case (freq, deg, score) =>
      assert(freq >= 5)
      assert(deg >= freq)
      assert(score >= 1.0)
    }
  }

  test("q238: pivot discovers exactly the five priority columns") {
    val df = graft.SparkEntry.queries("q238_dynamic_pivot")(spark, Sf)
    val cols = df.columns.toSet
    assert(cols == Set("l_returnflag", "URGENT", "HIGH", "MEDIUM",
      "NOTSPECIFIED", "LOW"))
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      (1 until 6).foreach(i => assert(!r.isNullAt(i)))
    }
  }
}
