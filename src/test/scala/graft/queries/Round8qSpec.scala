package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 87: chunk accounting identities. */
class Round8qSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("d45: distinct + redundant = total; rates in [0,1)") {
    val r = graft.SparkEntry.queries("d45_rag_chunks")(spark, Sf)
      .collect().head
    val (docs, total, distinct, dupGroups, redundant, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    assert(docs > 0)
    assert(total >= docs) // every doc yields at least one chunk
    assert(distinct + redundant == total)
    assert(dupGroups <= distinct)
    assert(rate >= 0.0 && rate < 1.0)
  }
}
