package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 45: split-leakage conservation and
  * seasonality-strength bounds.
  */
class Round7dSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d34: contingency cells conserve the d4 pair count; leaky = off-diagonal") {
    val cells = graft.SparkEntry.queries("d34_split_leakage")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    val totalPairs = graft.SparkEntry.queries("d4_minhash_pairs")(spark, Sf)
      .count()
    assert(cells.map(_._3).sum == totalPairs)
    cells.foreach { case (a, b, _, leaky) =>
      assert(leaky == (a != b))
      assert(Set("train", "val", "test")(a) && Set("train", "val", "test")(b))
    }
  }

  test("q182: seasonal strength is at most 1 and months are full windows") {
    val r = graft.SparkEntry.queries("q182_seasonality_strength")(spark, Sf)
      .collect().head
    assert(r.getLong(0) > 12, "needs more than a year of full windows")
    val s = r.getDouble(1)
    assert(s <= 1.0 + 1e-9)
    assert(s > -10.0, s"implausible strength $s")
  }
}
