package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 124: retention fit and Kaplan–Meier. */
class Round9ySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q289: retention rates are probabilities; slope constant per row") {
    val rows = graft.SparkEntry.queries("q289_retention_halflife")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    rows.foreach { case (k, act, obs, rk, slope, hl) =>
      assert(k >= 1); assert(act <= obs)
      assert(math.abs(rk - act.toDouble / obs) < 1e-5)
      // A flat curve (slope 0) legitimately has no finite half-life.
      assert(hl.isDefined === (slope != 0.0))
    }
    assert(rows.map(_._5).distinct.length === 1, "one fitted slope")
    assert(rows.map(_._6).distinct.length === 1, "one half-life")
  }

  test("q290: the survival curve is monotone nonincreasing from ~1") {
    val rows = graft.SparkEntry.queries("q290_survival_km")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._4 <= 1.0 + 1e-9)
    rows.map(_._4).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "S(t) never increases")
      case _           =>
    }
    rows.foreach { case (_, atRisk, deaths, s) =>
      assert(deaths >= 1 && deaths <= atRisk)
      assert(s >= 0.0 && s <= 1.0)
    }
    // At-risk counts shrink (weakly) as t grows.
    rows.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _           =>
    }
  }
}
