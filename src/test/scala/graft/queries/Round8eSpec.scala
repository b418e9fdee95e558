package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 75: PRF expansion structure and the
  * referential-integrity contract of the testdata.
  */
class Round8eSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("s26: 10 reranked docs; scores descending; term counts within 6") {
    val rows = graft.SparkEntry.queries("s26_prf_expansion")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    assert(rows.length == 10)
    assert(rows.map(_._4).toSeq == (1 to 10))
    assert(rows.map(_._2).toSeq ==
      rows.map(_._2).sortBy(-(_: Double)).toSeq)
    rows.foreach { case (_, s, nt, _) =>
      assert(s > 0.0)
      assert(nt >= 1 && nt <= 6)
    }
  }

  test("q226: all FK edges orphan-free; child counts positive") {
    val rows = graft.SparkEntry.queries("q226_fk_orphans")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 7)
    rows.foreach { case (_, n, orphans) =>
      assert(n > 0)
      assert(orphans == 0L)
    }
  }
}
