package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 100: winnowing guarantees and phonetic
  * block selectivity.
  */
class Round9dSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("t49: consecutive fingerprints never more than w=4 positions apart") {
    val rows = graft.SparkEntry.queries("t49_winnowing")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, fps) =>
      val ps = fps.map(_._2).sorted
      // Winnowing's coverage guarantee: every window of w consecutive
      // shingles contributes a fingerprint, so selected positions can
      // never be further than w apart (and the first is within the
      // first window).
      assert(ps.head <= 3)
      ps.sliding(2).foreach {
        case Array(a, b) => assert(b - a <= 4, s"gap $a -> $b")
        case _           =>
      }
    }
  }

  test("d49: winnow pairs are ordered, scored in (0,1], shared >= 2") {
    val rows = graft.SparkEntry.queries("d49_winnow_pairs")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, ov) =>
      assert(a < b)
      assert(n >= 2)
      assert(ov > 0.0 && ov <= 1.0)
    }
  }

  test("d48: vowel swaps always block with their source, liquid swaps never") {
    val rows = graft.SparkEntry.queries("d48_soundex_blocks")(spark, Sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (vd, vr, vm) = rows("vowel_swap")
    assert(vd > 0 && vr === vd && vm === 0L)
    val (ld, lr, lm) = rows("liquid_swap")
    assert(ld > 0 && lr === 0L && lm === ld)
  }
}
