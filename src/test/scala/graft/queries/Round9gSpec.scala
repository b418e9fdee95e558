package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 105: PAVA isotonic-fit invariants. */
class Round9gSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q258: blocks tile the bins, rates monotone non-decreasing") {
    val rows = graft.SparkEntry.queries("q258_isotonic")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // Contiguous non-overlapping spans starting at bin 0.
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 === a._3 + 1)
      case _           =>
    }
    assert(rows.head._2 === 0)
    rows.foreach { case (_, lo, hi, n, y, rate) =>
      assert(lo <= hi && y <= n && n > 0)
      assert(math.abs(rate - y.toDouble / n) < 1e-5)
    }
    // The whole point of PAVA: fitted rates never decrease.
    rows.map(_._6).sliding(2).foreach {
      case Array(a, b) => assert(b >= a, s"rates decreased: $a -> $b")
      case _           =>
    }
    // Pooled counts add back to the full orders table.
    val total = spark.read.parquet(s"$Sf/orders.parquet").count()
    assert(rows.map(_._4).sum === total)
  }
}
