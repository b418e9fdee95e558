package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the sixth round-6 batch: the bloom filter never
  * misses a true member and its FPR lands near theory, and VAD
  * segments tile the voiced frames.
  */
class Round9fSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q349: no false negatives; FPR within 4x of the bloom formula") {
    val r = q("q349_bloom_semijoin").collect().head
    val (nProbe, nCand, nActual, nFp, fpr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    assert(nCand >= nActual, "a bloom filter can NEVER miss a member")
    assert(nFp === nCand - nActual)
    assert(nProbe > nCand, "filter should reject most non-members")
    // theory: (1 - e^{-kn/m})^k with k=3, m=16384, n = build keys * 3
    val buildKeys = Tables.t(spark, Sf, "customer")
      .filter(col("c_nationkey") === 7).count()
    val p = 1.0 - math.exp(-3.0 * buildKeys / 16384.0)
    val theory = math.pow(p, 3)
    assert(fpr <= theory * 4 + 0.01,
      s"measured FPR $fpr far above theoretical $theory")
  }

  test("d58: the manifest tiles the corpus and its rates are coherent") {
    val rows = q("d58_corpus_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getDouble(6), r.getLong(7), r.getDouble(8), r.getDouble(9)))
    assert(rows.nonEmpty)
    val total = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.map(_._2).sum === total, "sources must tile the corpus")
    rows.foreach { case (src, nDocs, nTok, nLangs, topShare, dups,
        dupRate, passRate) =>
      assert(nTok > 0 && nLangs >= 1)
      assert(topShare >= 1.0 / nLangs - 1e-9 && topShare <= 1.0,
        s"$src top-lang share $topShare")
      assert(dups >= 0 && dups < nDocs)
      assert(math.abs(dupRate - dups.toDouble / nDocs) < 1e-12)
      assert(passRate >= 0.0 && passRate <= 1.0)
    }
    // dup totals replay exactly from a direct (source, text) rollup
    // (planted dup pairs may straddle sources, so >0 is not guaranteed)
    val expectedDups = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .groupBy("source", "text").count()
      .agg(sum(col("count") - 1)).collect().head.getLong(0)
    assert(rows.map(_._6).sum === expectedDups)
  }

  test("m26: voiced frames tile across segments; bounds hold") {
    val rows = q("m26_vad_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, voiced, nSeg, longest, frac) =>
      assert(voiced >= 0 && voiced <= 40)
      assert((voiced == 0) === (nSeg == 0))
      assert(longest <= voiced)
      // segments are disjoint voiced runs: their count is bounded by
      // the voiced mass and by ceil(40/2) alternation
      assert(nSeg <= voiced && nSeg <= 20)
      assert(math.abs(frac - voiced / 40.0) < 1e-12)
    }
    // md5 energies are ~uniform: roughly half the frames are voiced
    val meanFrac = rows.map(_._5).sum / rows.length
    assert(meanFrac > 0.35 && meanFrac < 0.65, s"mean voiced $meanFrac")
  }
}
