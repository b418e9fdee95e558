package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-6 batch: the PPS grid draws exactly k
  * thresholds, z-ordering beats the competing layouts on block count,
  * the host cap never keeps more than N docs, and greedy MMR trades
  * relevance for diversity monotonically.
  */
class Round9aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q339: hit multiplicities sum to exactly k; inclusion is PPS") {
    val rows = q("q339_systematic_pps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.map(_._3).sum === 100L, "grid must draw exactly k samples")
    assert(rows.forall(_._3 >= 1L))
    // a row spanning more than one grid cell (w > W/k) must multi-hit
    val bigW = Tables.t(spark, Sf, "orders")
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"))).collect().head.getLong(0)
    rows.foreach { case (k, w, hits) =>
      assert(hits <= w * 100L / bigW + 1,
        s"order $k drew $hits hits for weight $w")
    }
  }

  test("q340: z-order touches no more blocks than the competing layouts") {
    val rows = q("q340_zorder_pruning").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.keySet === Set("arrival", "custkey_sorted", "zorder"))
    // all three layouts hold the same rows
    assert(rows.values.map(_._2).toSet.size === 1)
    val matched = rows("zorder")._2
    val minBlocks = (matched + 999) / 1000
    assert(rows("zorder")._1 >= minBlocks)
    // the month predicate is what z-order clusters for: it must touch
    // no more blocks than either month-oblivious layout
    assert(rows("zorder")._1 <= rows("arrival")._1)
    assert(rows("zorder")._1 <= rows("custkey_sorted")._1)
  }

  test("d54: kept counts respect the cap and tile the corpus") {
    val rows = q("d54_host_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val total = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_._2).sum === total, "hosts must tile the corpus")
    rows.foreach { case (host, nDocs, nKept, totalChars, keptChars) =>
      assert(nKept === math.min(nDocs, 50L), s"$host cap violated")
      assert(keptChars <= totalChars)
      // keep-best-by-length: a capped host keeps at least its share
      if (nDocs > 0)
        assert(keptChars * nDocs >= totalChars * nKept - totalChars,
          s"$host kept docs are not the longest ones")
    }
  }

  test("q341: four delta-join partials reassemble the full join view") {
    val rows = q("q341_join_ivm").collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2))).toMap
    val full = Tables.t(spark, Sf, "orders")
      .join(Tables.t(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("s"))
      .collect()
      .map(r => (r.getInt(0).toLong, (r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === full.keySet)
    rows.foreach { case (k, v) => assert(v === full(k), s"nation $k") }
  }

  test("q342: estimates land within 3 sigma of the exact cardinalities") {
    val r = q("q342_kmv_set_ops").collect().head
    val (kU, exactUnion) = (r.getInt(0), r.getLong(5))
    val estUnion = r.getDouble(6)
    assert(kU >= 1 && kU <= 256)
    if (kU < 256) {
      // union smaller than the sketch: KMV degenerates to near-exact
      assert(math.abs(estUnion - exactUnion) / exactUnion < 0.5)
    } else {
      val rsd = 1.0 / math.sqrt(254.0)
      assert(math.abs(estUnion - exactUnion) / exactUnion < 3 * rsd,
        s"union est $estUnion vs exact $exactUnion")
    }
    val estInter = r.getDouble(7)
    val exactInter = r.getLong(3) + r.getLong(4) - r.getLong(5)
    if (exactInter > 0)
      assert(math.abs(estInter - exactInter) <= 0.5 * exactInter
        + 0.3 * exactUnion,
        s"intersection est $estInter vs exact $exactInter")
  }

  test("d55: allocations sum exactly to the budget; sqrt damps shares") {
    val rows = q("d55_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._4).sum === 10000L, "largest remainder must conserve")
    val totDocs = rows.map(_._2).sum.toDouble
    // temperature scaling: a source's allocation share must sit between
    // its doc share and the uniform share (sqrt damping)
    rows.foreach { case (src, n, _, alloc) =>
      val docShare = n / totDocs
      val allocShare = alloc / 10000.0
      val uniform = 1.0 / rows.length
      val lo = math.min(docShare, uniform) - 0.02
      val hi = math.max(docShare, uniform) + 0.02
      assert(allocShare >= lo && allocShare <= hi,
        s"$src alloc share $allocShare outside [$lo, $hi]")
    }
  }

  test("s36: MMR picks are distinct, round 1 is pure relevance, " +
    "and each later mmr is no higher than the previous") {
    val rows = q("s36_mmr_rerank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length === 5)
    assert(rows.map(_._2).distinct.length === 5, "picks must be distinct")
    val byRound = rows.sortBy(_._1)
    assert(byRound.head._4 === 0.0, "round 1 has no selected set yet")
    // the greedy objective is non-increasing: a candidate available at
    // round r was also available at r-1 with a no-larger penalty
    byRound.map(_._5).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"mmr rose: $a -> $b")
      case _ => ()
    }
  }
}
