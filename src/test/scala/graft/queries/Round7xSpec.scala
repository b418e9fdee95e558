package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 67: ensemble-vote consistency with the
  * underlying legs, and bitmap-sketch accuracy bounds.
  */
class Round7xSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d40: votes equal the set flags; every leg pair appears") {
    val rows = graft.SparkEntry.queries("d40_ensemble_votes")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, votes, mh, sh, tf, conf) =>
      assert(votes == Seq(mh, sh, tf).count(identity))
      assert(conf == (votes >= 2))
    }
    val mhPairs = graft.SparkEntry.queries("d4_minhash_pairs")(spark, Sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ensemble = rows.filter(_._4).map(r => (r._1, r._2)).toSet
    assert(ensemble == mhPairs)
  }

  test("q212: linear estimate within 12% of exact below saturation") {
    val rows = graft.SparkEntry.queries("q212_bitmap_rollup")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bits, exact) = (r.getLong(1), r.getLong(2))
      assert(bits <= math.min(exact, 4092L))
      if (!r.isNullAt(3)) {
        val est = r.getDouble(3)
        assert(est >= bits.toDouble - 1e-6)
        assert(math.abs(est - exact) / exact < 0.12)
      } else assert(r.getBoolean(4))
    }
  }
}
