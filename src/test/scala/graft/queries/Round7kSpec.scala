package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 52: purity/NMI ranges and entropy bounds.
  */
class Round7kSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d36: purity and NMI live in (0,1]") {
    val r = graft.SparkEntry.queries("d36_cluster_purity")(spark, Sf)
      .collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val (purity, nmi) = (r.getDouble(2), r.getDouble(3))
    assert(purity > 0.0 && purity <= 1.0 + 1e-9)
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-6, s"nmi $nmi")
  }

  test("q190: entropy bounded by ln(n_priorities); effective mix within count") {
    val rows = graft.SparkEntry.queries("q190_mix_entropy")(spark, Sf)
      .collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (k, h, eff) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6)
      assert(eff >= 1.0 - 1e-9 && eff <= k + 1e-6)
    }
  }
}
