package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 93: boundary picks hug the median and
  * tiers partition the part universe.
  */
class Round8wSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d47: distances nondecreasing; pick 1 is the closest doc") {
    val rows = graft.SparkEntry.queries("d47_boundary_sampling")(spark, Sf)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(4)))
    assert(rows.length == 20)
    val d = rows.sortBy(_._1).map(_._2)
    assert(d.toSeq == d.sorted.toSeq)
    assert(d.head <= d.last)
  }

  test("q248: tiers cover all parts; age bands respect their bounds") {
    val rows = graft.SparkEntry.queries("q248_storage_tiering")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(4), r.getInt(5)))
    val total = rows.map(_._2).sum
    val parts = Tables.t(spark, Sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(total == parts)
    rows.foreach {
      case ("hot", _, lo, hi) => assert(lo >= 0 && hi <= 90)
      case ("warm", _, lo, hi) => assert(lo >= 91 && hi <= 365)
      case ("cold", _, lo, _) => assert(lo >= 366)
      case other => fail(s"unexpected tier $other")
    }
  }
}
