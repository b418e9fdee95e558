package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q117/q118/m12 batch: association metrics
  * reconcile with recomputed counts, the gains table conserves totals,
  * and tile grids cover their images.
  */
class Round5lSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q117: metrics replay from counts; top list sorted and bounded") {
    val rows = q("q117_market_basket").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val items = Tables.t(spark, Sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val nOrders = items.select("l_orderkey").distinct().count()
    val cnts = rows.map(_.getLong(2))
    assert(cnts.sameElements(cnts.sorted.reverse), "not sorted by cnt desc")
    rows.foreach { r =>
      val (a, b, cnt, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(a < b)
      assert(cnt <= math.min(ca, cb))
      assert(r.getDouble(5) === (cnt.toDouble / nOrders * 1e6).round / 1e6)
      assert(r.getDouble(6) <= 1.0 + 1e-9)
      assert(r.getDouble(7) > 0.0)
    }
    // spot-replay one pair's basket count
    val h = rows.head
    val inA = items.filter(col("l_partkey") === h.getLong(0))
      .select("l_orderkey")
    val inB = items.filter(col("l_partkey") === h.getLong(1))
      .select("l_orderkey")
    assert(inA.intersect(inB).count() === h.getLong(2))
  }

  test("q118: totals conserve; capture monotone; deciles complete") {
    val rows = q("q118_decile_lift").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    val nCust = Tables.t(spark, Sf, "customer").count()
    assert(rows.map(_.getLong(1)).sum === nCust)
    val totalPos = rows.map(_.getLong(2)).sum
    assert(rows.last.getLong(3) === totalPos, "final cum != total pos")
    val caps = rows.map(_.getDouble(4))
    assert(caps.zip(caps.tail).forall { case (x, y) => x <= y })
    assert(math.abs(caps.last - 1.0) < 1e-9)
    // decile sizes differ by at most 1 (rank cut, not value cut)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
  }

  test("m12: grid covers the image; clamped tiles accounted") {
    val rows = q("m12_tile_grid").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      val (nx, ny, nt, nFull) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nt === nx * ny)
      assert(nFull <= nt)
      // grid shape: stride-48 ceil over the overlap-adjusted extent
      assert(nx === math.max(1, (w - 16 + 47) / 48), s"media ${r.getLong(0)}")
      assert(ny === math.max(1, (h - 16 + 47) / 48))
      // coverage: the clamped last tile reaches the image edge
      assert((nx - 1) * 48 + 64 >= w || w < 64)
      if (w >= 64 && h >= 64) assert(nFull === nt,
        "clamping breaks full-tile invariant for 64px-capable images")
    }
    assert(rows.exists(_.getLong(5) > 1), "no media with a multi-tile grid")
  }
}
