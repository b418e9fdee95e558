package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 98: Jaccard identities on the assortment
  * matrix.
  */
class Round9bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q254: jaccard in (0,1]; intersection bounded by both sizes") {
    val rows = graft.SparkEntry.queries("q254_assortment_jaccard")(
      spark, Sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (common, s1, s2, j) =>
      assert(common >= 1 && common <= math.min(s1, s2))
      assert(j > 0.0 && j <= 1.0)
      val expect = common.toDouble / (s1 + s2 - common)
      assert(math.abs(j - expect) < 1e-5)
    }
  }
}
