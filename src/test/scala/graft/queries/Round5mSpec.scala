package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q119/q120/t26 batch: zone-map envelopes are
  * sound (no skipped file could contain a match), PSI terms are
  * non-negative and conserve counts, and planted code blocks are caught.
  */
class Round5mSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q119: full-range pred skips nothing; skipped files hold no match") {
    val rows = q("q119_zonemap_skipping").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 5))
    val nOrders = Tables.t(spark, Sf, "orders").count()
    val full = rows.find(_.getInt(0) === 5).get
    assert(full.getLong(4) === 0L, "full-range predicate skipped files")
    assert(full.getLong(5) === nOrders)
    rows.foreach { r =>
      assert(r.getLong(3) === rows.head.getLong(3), "file count varies")
      assert(r.getLong(4) <= r.getLong(3))
      assert(r.getLong(5) <= nOrders)
      // soundness: rows actually matching the predicate all live in
      // scanned files, so scanned >= matching
      val matching = Tables.t(spark, Sf, "orders")
        .filter(col("o_totalprice") >= r.getLong(1) &&
          col("o_totalprice") <= r.getLong(2)).count()
      assert(r.getLong(5) >= matching,
        s"pred ${r.getInt(0)} skipped a file containing matches")
    }
  }

  test("q120: counts conserve; terms non-negative; total row replays") {
    val rows = q("q120_psi_drift").collect()
    assert(rows.length === 21)
    val (total, bins) = rows.partition(_.getLong(0) === -1L)
    val nLine = Tables.t(spark, Sf, "lineitem").count()
    assert(total.head.getLong(1) + total.head.getLong(2) === nLine)
    assert(bins.map(_.getLong(1)).sum === total.head.getLong(1))
    assert(bins.map(_.getLong(2)).sum === total.head.getLong(2))
    bins.foreach(r => assert(r.getDouble(3) >= 0.0,
      s"bin ${r.getLong(0)} PSI term negative"))
    val replayed = bins.map(r => BigDecimal(r.getDouble(3))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(math.abs(total.head.getDouble(3) - replayed) < 1e-12)
  }

  test("t26: planted code detected; prose stays prose") {
    val rows = q("t26_code_score").collect()
    val (planted, base) = rows.partition(_.getLong(0) >= 200000L)
    val expectedPlanted = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull && col("doc_id") % 40 === 0).count()
    assert(planted.length.toLong === expectedPlanted)
    planted.foreach { r =>
      assert(r.getBoolean(6), s"planted doc ${r.getLong(0)} not flagged")
      assert(r.getLong(3) >= 2, "planted doc lost its keywords")
    }
    assert(base.count(_.getBoolean(6)) < base.length / 10,
      "prose corpus mostly flagged as code")
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }
}
