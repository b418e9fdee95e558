package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 44: tail-statistic ordering, core-degree
  * floor, mask-coverage bounds.
  */
class Round7cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q180: k = ceil(n/20) and VaR >= CVaR (max of tail >= its mean)") {
    val r = graft.SparkEntry.queries("q180_var_cvar")(spark, Sf)
      .collect().head
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(k == (n + 19) / 20)
    val varC = r.getLong(2).toDouble
    assert(varC >= r.getDouble(3))
  }

  test("q181: every 3-core member has degree >= 3 within the core") {
    val rows = graft.SparkEntry.queries("q181_kcore")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    assert(rows.nonEmpty)
    rows.foreach { case (n, d) => assert(d >= 3, s"node $n degree $d") }
  }

  test("d33: masked token counts stay within the doc's token budget") {
    val rows = graft.SparkEntry.queries("d33_span_mask")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, masked, frac) =>
      assert(masked >= 8, s"doc $id masked $masked < span width")
      assert(masked <= nTok, s"doc $id masked $masked > tokens $nTok")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }
}
