package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 119: item CF and TextRank. */
class Round9tSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q281: neighbor lists are ranked, deduplicated, and symmetric-ish") {
    val rows = graft.SparkEntry.queries("q281_item_cf")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (brand, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2) === (1 to g.length), s"ranks 1..k for $brand")
      // Similarity never increases down the ranked list.
      sorted.map(_._5).sliding(2).foreach {
        case Array(hi, lo) => assert(lo <= hi + 1e-9)
        case _             =>
      }
      assert(g.map(_._3).distinct.length === g.length)
      g.foreach { case (b, _, nb, cooc, sim) =>
        assert(b != nb); assert(cooc > 0); assert(sim > 0 && sim <= 1 + 1e-9)
      }
    }
  }

  test("t51: rank mass is conserved (within integer-truncation loss)") {
    val rows = graft.SparkEntry.queries("t51_textrank")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // Truncating integer PageRank only LOSES mass, bounded by a few
    // units per node/edge per iteration.
    assert(total <= graft.operators.PageRank.Scale)
    assert(total > graft.operators.PageRank.Scale * 98 / 100,
      s"mass $total dropped more than 2%")
    // Descending output order by construction.
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
  }
}
