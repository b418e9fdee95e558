package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 53: fan-out profile consistency and χ²
  * degrees of freedom.
  */
class Round7lSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q191: fan-out stats are internally consistent") {
    val rows = graft.SparkEntry.queries("q191_fk_fanout_profile")(spark, Sf)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (np, nc) = (r.getLong(1), r.getLong(2))
      val (mn, mx) = (r.getLong(3), r.getLong(4))
      val (mean, med) = (r.getDouble(5), r.getLong(6))
      assert(np > 0 && nc >= np || mn == 0)
      assert(mn <= med && med <= mx)
      assert(mean >= mn.toDouble - 1e-9 && mean <= mx.toDouble + 1e-9)
      assert(math.abs(mean - nc.toDouble / np) < 1e-5)
    }
  }

  test("d37: chi2 non-negative; dof matches a 3-split design") {
    val r = graft.SparkEntry.queries("d37_split_balance")(spark, Sf)
      .collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) >= 0.0)
    val dof = r.getLong(2)
    assert(dof >= 2 && dof % 2 == 0, s"dof $dof for (3-1)x(c-1)")
  }
}
