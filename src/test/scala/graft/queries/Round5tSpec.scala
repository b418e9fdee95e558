package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the q130/q131/m14 batch: Benford fractions
  * conserve, the bridge identity holds exactly, and planted clipping
  * runs are detected.
  */
class Round5tSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q130: digits complete; fractions conserve; Benford curve sane") {
    val rows = q("q130_benford_audit").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 9))
    assert(rows.map(_.getLong(1)).sum ===
      Tables.t(spark, Sf, "orders").count())
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-5)
    val exp = rows.map(_.getDouble(3))
    assert(exp.zip(exp.tail).forall { case (a, b) => a > b },
      "Benford expectation not decreasing")
    assert(math.abs(exp.sum - 1.0) < 1e-5)
  }

  test("q131: price + volume terms equal the scaled delta exactly") {
    val rows = q("q131_price_volume_bridge").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val deltas = rows.map(r => math.abs(r.getDouble(7)))
    assert(deltas.sameElements(deltas.sorted.reverse))
    rows.foreach { r =>
      val (pt, vt, ds) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(math.abs(pt + vt - ds) <= 1e-6 * math.max(1.0, math.abs(ds)),
        s"part ${r.getLong(0)} bridge identity")
      assert(r.getLong(4) > 0)
    }
  }

  test("m14: planted clip runs detected; fractions bounded") {
    val rows = q("m14_audio_clipping").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val planted = rows.filter(_.getLong(0) % 30 == 0)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(r.getLong(4) >= 19L,
        s"media ${r.getLong(0)} lost its planted clip run")
    }
    assert(rows.exists(r => r.getLong(0) % 30 != 0 && r.getLong(4) === 0L),
      "clipping detector fires on everything")
  }
}
