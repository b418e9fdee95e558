package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the fifth round-6 batch: erasure cascades
  * conserve, tiering only compresses, and the quality keeper always
  * wins its cluster on length.
  */
class Round9eSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q347: cascade counts conserve against direct replays") {
    val rows = q("q347_erasure_cascade").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.length === 25)
    val erased = Tables.t(spark, Sf, "customer")
      .filter(graft.functions.Md5Pack(concat(lit("erase_"),
        col("c_custkey").cast("string"))) % 97 === 0)
    // customers_erased counts only customers WITH orders, so it is
    // bounded by the deletion list per nation
    val perNation = erased.groupBy("c_nationkey").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (nk, nCust, nOrd, rev, share, orphans) =>
      assert(nCust <= perNation.getOrElse(nk, 0L))
      assert(orphans === nOrd, "orphan count must equal the cascade size")
      assert(share >= 0.0 && share < 1.0)
      assert((rev == 0) === (nOrd == 0))
    }
  }

  test("q348: tiers partition events; only aggregation tiers compress") {
    val rows = q("q348_retention_tiering").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq === Seq("daily", "hourly", "raw"))
    val total = Tables.events(spark, Sf).count()
    assert(rows.map(_._2).sum === total)
    val byTier = rows.map(r => r._1 -> r).toMap
    // raw keeps everything
    assert(byTier("raw")._2 === byTier("raw")._3)
    // aggregation tiers can only shrink, and daily at least as much as
    // hourly in ratio
    assert(byTier("hourly")._3 <= byTier("hourly")._2)
    assert(byTier("daily")._3 <= byTier("daily")._2)
    rows.foreach { case (_, before, after, c) =>
      assert(math.abs(c - before.toDouble / after) < 1e-9)
    }
  }

  test("d57: the quality keeper has its cluster's max length") {
    val rows = q("d57_quality_keeper").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val chars = Tables.t(spark, Sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (label, size, minId, bestId, changed, spread) =>
      assert(size >= 2, s"cluster $label too small")
      assert(changed === (minId != bestId))
      assert(spread >= 0)
      // the keeper is at least as long as the min-id policy's pick
      assert(chars(bestId) >= chars(minId),
        s"cluster $label: quality keeper $bestId shorter than $minId")
    }
    assert(rows.exists(_._5), "no cluster changed keeper — test corpus " +
      "should exercise the policy difference")
  }
}
