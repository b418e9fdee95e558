package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 91: inverse-CDF monotonicity and the
  * sampler's concentration around its expected rate.
  */
class Round8uSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q245: pct_below monotone in the threshold per flag") {
    val rows = graft.SparkEntry.queries("q245_inverse_cdf")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(rows.length == 15)
    rows.groupBy(_._1).foreach { case (_, ts) =>
      val sorted = ts.sortBy(_._2).map(_._3)
      assert(sorted.toSeq == sorted.sorted.toSeq)
      sorted.foreach(p => assert(p >= 0.0 && p <= 1.0))
    }
  }

  test("t47: acceptance tracks the expected rate per source") {
    val rows = graft.SparkEntry.queries("t47_weighted_sampling")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, kept, accept, expected) =>
      assert(kept <= n)
      assert(expected >= 0.0 && expected <= 1.0)
      // md5 uniformity: acceptance within a loose binomial band
      assert(math.abs(accept - expected) < 0.25 + 2.0 / math.sqrt(n.toDouble))
    }
  }
}
