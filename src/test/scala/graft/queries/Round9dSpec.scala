package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the fourth round-6 batch: the zone map can only
  * over-admit (never miss a matching file), and PSI is symmetric-finite
  * with a threshold-consistent verdict.
  */
class Round9dSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q345: admitted is a superset of matching; fpr replays") {
    val rows = q("q345_zone_map_fpr").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (m, admitted, matching, rowsM, fpr) =>
      assert(matching >= 1 && rowsM >= 1)
      assert(admitted >= matching,
        s"month $m: zone map MISSED files (admitted $admitted < $matching)")
      assert(admitted <= 128L)
      assert(math.abs(fpr - (admitted - matching).toDouble / admitted)
        < 1e-12)
    }
  }

  test("q346: PSI is finite and non-negative; verdict matches thresholds") {
    val r = q("q346_psi_drift").collect().head
    val (nBins, psi, verdict) = (r.getLong(0), r.getDouble(1),
      r.getString(2))
    assert(nBins >= 1 && nBins <= 20)
    assert(!psi.isNaN && !psi.isInfinite)
    // PSI is a symmetrized KL: every term (p−q)·ln(p/q) >= 0
    assert(psi >= -1e-9, s"PSI $psi negative")
    val expected =
      if (psi < 0.1) "stable"
      else if (psi < 0.25) "moderate_shift" else "major_shift"
    assert(verdict === expected)
  }
}
