package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 76: merged-schema NULL pattern and int8
  * quantization quality floors.
  */
class Round8fSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q227: generation determines which evolved column is NULL") {
    val rows = graft.SparkEntry.queries("q227_merge_schema")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.isNullAt(2), r.isNullAt(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, segNull, balNull, gen) =>
      assert(gen == (if (k % 2 == 0) 2 else 1))
      assert(segNull == (gen == 1))
      assert(balNull == (gen == 2))
    }
  }

  test("s27: int8 keeps cosine ≈ 1 and bounded rms error") {
    val rows = graft.SparkEntry.queries("s27_int8_quantization")(spark, Sf)
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 500)
    rows.foreach { case (scale, rms, cos) =>
      assert(scale > 0.0)
      // max quantization error per dim is scale/2 → rms bounded by it
      assert(rms <= scale / 2 + 1e-9)
      assert(cos > 0.99)
    }
  }
}
