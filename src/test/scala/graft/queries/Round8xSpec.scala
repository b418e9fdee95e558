package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 94: advisor arithmetic and reshape
  * losslessness.
  */
class Round8xSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q249: estimates positive; partitions = ceil(bytes/128MiB)") {
    val rows = graft.SparkEntry.queries("q249_partition_advisor")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 3)
    rows.foreach { case (n, bytes, parts) =>
      assert(n > 0 && bytes > n)
      val expected = math.max(
        math.ceil(bytes.toDouble / (128L * 1024 * 1024)).toLong, 1L)
      assert(parts == expected)
    }
  }

  test("q250: every nation roundtrips") {
    val rows = graft.SparkEntry.queries("q250_reshape_roundtrip")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(1)))
  }
}
