package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 48: estimator coherence, Pareto head
  * bounds, coverage bounds.
  */
class Round7gSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q186: estimate = 16x sample; error within a plausible band") {
    val r = graft.SparkEntry.queries("q186_join_size_estimate")(spark, Sf)
      .collect().head
    assert(r.getLong(2) == r.getLong(1) * 16)
    assert(r.getLong(0) > 0)
    // universe sampling on an FK join at 1/16 stays within ±60% here
    assert(math.abs(r.getDouble(3)) < 60.0, s"err ${r.getDouble(3)}%")
  }

  test("q187: head counts are within [1, n_cust] and frac matches") {
    val rows = graft.SparkEntry.queries("q187_pareto_coverage")(spark, Sf)
      .collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val (n, top, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(top >= 1 && top <= n)
      assert(math.abs(frac - top.toDouble / n) < 1e-6)
      // covering 80% of mass can't take more than ~80% of members + 1
      assert(top <= (n * 4) / 5 + 1)
    }
  }

  test("t31: head coverage lies in (0,1]; head mass <= total") {
    val rows = graft.SparkEntry.queries("t31_stopword_coverage")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1))
      val cov = r.getDouble(4)
      assert(cov > 0.0 && cov <= 1.0)
      // 50-token head can't cover more tokens than vocab allows
      assert(r.getLong(2) >= 50 || cov == 1.0)
    }
  }
}
