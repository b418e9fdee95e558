package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 110: greedy set cover and Markov eval. */
class Round9kSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q263: diminishing gains, cumulative = prefix sum, distinct picks") {
    val rows = graft.SparkEntry.queries("q263_set_cover")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.length === 5)
    assert(rows.map(_._2).distinct.length === 5, "no source picked twice")
    // Greedy gains never increase round over round.
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"gain rose: $a -> $b")
      case _           =>
    }
    var cum = 0L
    rows.foreach { case (_, _, g, c, s) =>
      cum += g
      assert(c === cum, "cumulative coverage = prefix sum of gains")
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("t50: divergence identities hold between the corpus halves") {
    val r = graft.SparkEntry.queries("t50_divergence")(spark, Sf)
      .collect().head
    val (klab, klba, js, hel, tv) = (r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7))
    Seq(klab, klba, js, hel, tv).foreach(x => assert(x >= 0.0))
    assert(js <= math.log(2) + 1e-6, "JS is bounded by ln 2")
    assert(js <= (klab + klba) / 2 + 1e-6, "mixture KL never exceeds direct")
    assert(tv <= 1.0 && hel <= 1.0)
    // Hellinger–TV sandwich: H^2 <= TV <= sqrt(2)*H.
    assert(hel * hel <= tv + 1e-6)
    assert(tv <= math.sqrt(2) * hel + 1e-6)
  }

  test("q264: one rule per event type, bounded accuracy") {
    val rows = graft.SparkEntry.queries("q264_markov_accuracy")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val types = Set("click", "view", "purchase", "signup", "error")
    assert(rows.map(_._1).toSet.subsetOf(types))
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (_, pred, n, c, a) =>
      assert(types.contains(pred))
      assert(c >= 0 && c <= n && n > 0)
      assert(math.abs(a - c.toDouble / n) < 1e-5)
    }
  }
}
