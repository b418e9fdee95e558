package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 60: the rounding/collation pin values
  * themselves and gap-census arithmetic.
  */
class Round7rSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q199: pins carry the exact agreed corner values") {
    val m = graft.SparkEntry.queries("q199_rounding_collation")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("dec_half_up") == "3" && m("dec_half_neg") == "-3")
    assert(m("dbl_repr_round") == "2.68" && m("dbl_repr_neg") == "-2.68")
    assert(m("binary_collation_lt") == "true")
    assert(m("binary_greatest") == "a")
  }

  test("q200: gap months = span - active, always positive in the report") {
    val rows = graft.SparkEntry.queries("q200_shipment_gaps")(spark, Sf)
      .collect()
    rows.foreach { r =>
      val (act, span, gap) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(gap == span - act && gap > 0)
      assert(act >= 1 && span >= act)
    }
  }
}
