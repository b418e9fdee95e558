package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 69: the three-valued NOT IN contract and
  * null-first window ordering.
  */
class Round7zSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q215: one NULL empties NOT IN; NOT EXISTS unaffected") {
    val r = graft.SparkEntry.queries("q215_not_in_null")(spark, Sf)
      .collect().head
    val (withNull, notExists, clean) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(withNull == 0L)
    assert(notExists > 0L)
    assert(clean == notExists) // o_custkey has no NULLs in this data
  }

  test("q216: customers with an urgent order pick the NULL key first") {
    val rows = graft.SparkEntry.queries("q216_null_window_order")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getString(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, p, pickedNull) =>
      assert(pickedNull == (p == null))
    }
    // the data surely contains urgent orders, so some picks are NULL
    assert(rows.exists(_._3))
    assert(rows.exists(!_._3))
  }
}
