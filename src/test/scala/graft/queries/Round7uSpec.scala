package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 63: rolling-actives dominance, SCD2
  * point-in-time tiling, RRF fusion bounds, and TTR invariants.
  */
class Round7uSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q206: rolling 7-day actives dominate the daily count") {
    val rows = graft.SparkEntry.queries("q206_rolling_actives")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, roll) =>
      assert(roll >= day && day >= 1)
    }
  }

  test("q207: every order covered by exactly one SCD2 version") {
    val r = graft.SparkEntry.queries("q207_scd2_pit_audit")(spark, Sf)
      .collect().head
    val (orders, covered, holes, agree) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(orders > 0)
    assert(covered == orders)
    assert(holes == 0L)
    // agreement can't exceed coverage but must be substantial: the
    // day-snapshot rep itself always agrees
    assert(agree > 0 && agree <= covered)
  }

  test("s24: 5 per probe, rrf within the two-leg bounds, legs nonempty") {
    val rows = graft.SparkEntry.queries("s24_rrf_hybrid")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3),
        r.getBoolean(4), r.getInt(5)))
    assert(rows.length == 50)
    assert(rows.map(_._1).distinct.length == 10)
    rows.foreach { case (_, rrf, inSem, inLex, rank) =>
      assert(rank >= 1 && rank <= 5)
      assert(inSem || inLex)
      // max possible: 1/61 + 1/61; min: rank-20 single leg = 1/80
      assert(rrf >= 1.0 / 80 - 1e-9 && rrf <= 2.0 / 61 + 1e-9)
    }
  }

  test("t36: types never exceed tokens; ratios in range") {
    val rows = graft.SparkEntry.queries("t36_lexical_diversity")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, ty) = (r.getLong(1), r.getLong(2))
      assert(ty <= tok)
      if (!r.isNullAt(3)) {
        val ttr = r.getDouble(3)
        assert(ttr > 0.0 && ttr <= 1.0)
      }
    }
  }
}
