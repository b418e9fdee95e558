package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the s18/q162 batch: the tuning curve is monotone
  * in the shortlist width and consistent with s17; hierarchical shares
  * sum to one at each level.
  */
class Round6nSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("s18: recall is monotone in k and matches s17 at k=20") {
    val rows = q("s18_rerank_tradeoff").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(5, 10, 20))
    assert(rows.forall(_._3 === 50L))
    val recalls = rows.map(_._4)
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"recall not monotone: $recalls")
    // k=20 recall here must equal the overlap s17 achieves (same
    // shortlist, and reranking a shortlist never changes membership)
    val exact = q("s1_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s17 = q("s17_two_stage_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val s17Recall = (exact & s17).size.toDouble / exact.size
    // s17 keeps top-5 of the 20-wide shortlist; hits beyond rank 5 of
    // the rerank are counted by s18@20 but not s17, so s18@20 ≥ s17
    assert(recalls(2) >= s17Recall - 1e-9)
  }

  test("q162: shares sum to 1 within each region and across regions") {
    val rows = q("q162_share_of_parent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length === 25)
    rows.groupBy(_._1).foreach { case (region, g) =>
      val s = g.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"region $region shares sum $s")
      // region_share constant within a region
      assert(g.map(_._5).distinct.length === 1)
    }
    val regionShares = rows.groupBy(_._1).map(_._2.head._5)
    assert(math.abs(regionShares.sum - 1.0) < 1e-4)
  }
}
