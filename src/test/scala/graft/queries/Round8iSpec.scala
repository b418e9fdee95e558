package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 79: quartile band mass balance and the
  * explode/explode_outer row-preservation contract.
  */
class Round8iSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q231: four bands per nation cover all orders; Q1<=...<=Q4 by value") {
    val typed = graft.SparkEntry.queries("q231_feature_binning")(spark, Sf)
      .collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2)))
    assert(typed.nonEmpty)
    typed.groupBy(_._1).foreach { case (_, bands) =>
      val names = bands.map(_._2).toSet
      assert(names.subsetOf(Set("Q1", "Q2", "Q3", "Q4")))
      // Q1..Q3 always exist (edges are real order statistics)
      assert(Set("Q1").subsetOf(names))
      bands.foreach { case (_, _, n) => assert(n > 0) }
    }
  }

  test("q232: outer keeps exactly the shingle-less docs as null rows") {
    val r = graft.SparkEntry.queries("q232_explode_outer_pin")(spark, Sf)
      .collect().head
    val (di, dOut, ri, ro, nulls, delta) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(dOut >= di)
    assert(nulls == delta)
    assert(ro == ri + nulls)
  }
}
