package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 59: the NULL-semantics identities and
  * empty-aggregate contracts hold at any scale.
  */
class Round7qSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q197: three-valued logic identities hold") {
    val m = graft.SparkEntry.queries("q197_null_semantics")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // NOT IN with a NULL in the list selects NOTHING
    assert(m("cnt_not_in_with_null") == 0L)
    // NULL = NULL is not true; NULL <=> NULL is
    assert(m("cnt_plain_eq_self") < m("cnt_star"))
    assert(m("cnt_null_safe_eq_self") == m("cnt_star"))
    // count(col) counts exactly the non-null rows = plain-eq survivors
    assert(m("cnt_col_excludes_null") == m("cnt_plain_eq_self"))
    assert(m("first_key_nulls_first") > 0L)
  }

  test("q198: empty input yields NULL sums, zero counts, no groups") {
    val r = graft.SparkEntry.queries("q198_empty_aggregates")(spark, Sf)
      .collect().head
    assert(r.getLong(0) == 0L)
    assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(r.getLong(4) == 0L)
  }
}
