package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the m15/q167 batch: every clip identifies its
  * true source, and the discount-cap counterfactual only ever raises
  * revenue.
  */
class Round6tSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("m15: every clip matches its own source with dominant votes") {
    val rows = q("m15_audio_fingerprint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "no clips qualified")
    rows.foreach { case (clipId, srcId, matched, votes) =>
      assert(clipId === srcId + 500000L)
      assert(matched === srcId,
        s"clip $clipId matched $matched, not its source $srcId")
      assert(votes >= 2L,
        s"clip $clipId matched on only $votes offset-consistent votes")
    }
  }

  test("q167: policy revenue dominates booked; uplift adds up") {
    val rows = q("q167_discount_cap_whatif").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nLines = Tables.t(spark, Sf, "lineitem").count()
    assert(rows.map(_._2).sum === nLines)
    rows.foreach { case (_, _, booked, policy, uplift, share) =>
      // capping discounts at 5% can only raise revenue
      assert(policy >= booked)
      assert(math.abs(uplift - (policy - booked)) < 1e-6)
      assert(share >= 0.0)
    }
    // the corpus has discounts above 5%, so some year gains
    assert(rows.exists(_._6 > 0.0))
  }
}
