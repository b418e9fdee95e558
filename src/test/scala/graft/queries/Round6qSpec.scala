package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q165/d31 batch: the heatmap tiles the event
  * stream with the hot test replaying sequentially, and the similarity
  * bands partition d4's pair set above its threshold.
  */
class Round6qSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q165: hours tile the events; hot test replays sequentially") {
    val rows = q("q165_dow_hour_heatmap").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.t(spark, Sf, "events").count()
    assert(rows.map(_._2).sum === total)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 23))
    val cells = Tables.t(spark, Sf, "events")
      .groupBy((weekday(col("ts")) + 1).as("dow"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    rows.foreach { case (hr, nEvents, nHot, peak) =>
      val ns = cells.filter(_._2 == hr).map(_._3)
      assert(nEvents === ns.sum)
      assert(peak === ns.max)
      val s = ns.sum; val ss = ns.map(x => BigInt(x) * x).sum
      val expHot = ns.count { n =>
        BigInt(7) * BigInt(7 * n - s) * BigInt(7 * n - s) >
          BigInt(4) * (BigInt(7) * ss - BigInt(s) * s)
      }
      assert(nHot === expHot.toLong, s"hour $hr hot count")
    }
  }

  test("d31: bands partition d4's pairs above its threshold") {
    val bands = q("d31_pair_jaccard_bands").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val nPairs = graft.SparkEntry.queries("d4_minhash_pairs")(spark, Sf)
      .count()
    assert(bands.map(_._2).sum === nPairs)
    bands.foreach { case (band, n, minJ, maxJ) =>
      assert(n > 0)
      assert(minJ <= maxJ)
      assert(minJ >= band / 20.0 - 1e-9 && maxJ < (band + 1) / 20.0 + 1e-9)
    }
    // d4 verifies at a Jaccard threshold; no band may sit below it
    assert(bands.forall(_._3 >= 0.5))
  }
}
