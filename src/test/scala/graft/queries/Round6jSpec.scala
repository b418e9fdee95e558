package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the s17/q157 batch: the two-stage rerank is a
  * faithful shortlist-then-rescore (high recall vs exact search), and
  * scorecard components stay in range with the blend replaying from
  * its parts.
  */
class Round6jSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("s17: 10 probes x top-5; recall vs exact search is high") {
    val rows = q("s17_two_stage_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length === 50)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
    val exact = q("s1_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoStage = rows.map(r => (r._1, r._2)).toSet
    val recall = (exact & twoStage).size.toDouble / exact.size
    // int8 quantization barely moves cosines: the 20-wide shortlist
    // should recover nearly every exact top-5 neighbor
    assert(recall >= 0.8, s"two-stage recall $recall")
  }

  test("q157: components in range; blend replays from its parts") {
    val rows = q("q157_supplier_scorecard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length === 10)
    rows.foreach { case (_, _, vs, rr, ad, score) =>
      assert(vs >= 0.0 && vs <= 1.0)
      assert(rr >= 0.0 && rr <= 1.0)
      assert(ad >= 0.0 && ad <= 1.0)
      val blend = BigDecimal("0.5") * BigDecimal(vs).setScale(6,
          BigDecimal.RoundingMode.HALF_UP) +
        BigDecimal("0.3") * (BigDecimal(1) - BigDecimal(rr).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)) +
        BigDecimal("0.2") * (BigDecimal(1) - BigDecimal(ad).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))
      assert(math.abs(score - blend.toDouble) < 1e-9,
        s"score $score vs blend $blend")
    }
    // descending by score
    assert(rows.map(_._6).toSeq ==
      rows.map(_._6).toSeq.sorted(Ordering[Double].reverse))
  }
}
