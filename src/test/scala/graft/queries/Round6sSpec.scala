package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for d32: counts cohere with the component queries,
  * verified LSH pairs are never false positives, and recall is
  * meaningfully high at the shared threshold.
  */
class Round6sSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d32: coherent counts, zero false positives, high recall") {
    val r = graft.SparkEntry.queries("d32_lsh_recall")(spark, Sf)
      .collect().head
    val (nExact, nLsh, nMatched, nMissed, nLshOnly, recall) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val exact = graft.SparkEntry.queries("d11_prefix_filter_pairs")(
      spark, Sf).count()
    val lsh = graft.SparkEntry.queries("d4_minhash_pairs")(spark, Sf)
      .count()
    assert(nExact === exact && nLsh === lsh)
    assert(nMatched + nMissed === nExact)
    assert(nMatched + nLshOnly === nLsh)
    // every verified LSH pair passes the exact-Jaccard gate, so it
    // must exist in the exact pair set
    assert(nLshOnly === 0L, "verified LSH pair missing from exact set")
    assert(recall > 0.5, s"LSH recall $recall suspiciously low")
    assert(recall <= 1.0)
  }
}
