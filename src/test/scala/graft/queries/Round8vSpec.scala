package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 92: advisor rule boundaries and pagination
  * equivalence.
  */
class Round8vSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q246: advice matches its own rule on every row") {
    val rows = graft.SparkEntry.queries("q246_encoding_advisor")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    assert(rows.length == 6)
    rows.foreach { case (n, d, ratio, advice) =>
      assert(d >= 1 && d <= n)
      val expected =
        if (d <= 100) "RLE_DICT"
        else if (d.toDouble / n <= 0.1) "DICT"
        else "PLAIN"
      assert(advice == expected)
      assert(math.abs(ratio - d.toDouble / n) < 1e-6)
    }
  }

  test("q247: keyset equals offset pagination") {
    val r = graft.SparkEntry.queries("q247_keyset_pagination")(spark, Sf)
      .collect().head
    assert(r.getBoolean(r.length - 1))
    assert(r.getLong(0) == 100L)
  }
}
