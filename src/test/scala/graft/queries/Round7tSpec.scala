package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 62: correlation-matrix symmetry bounds,
  * SCD2 interval integrity, Theil decomposition identities, Adamic–Adar
  * bounds, and the per-row text metrics.
  */
class Round7tSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q202: 6 distinct pairs, every corr in [-1,1], n_rows constant") {
    val rows = graft.SparkEntry.queries("q202_correlation_matrix")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    assert(rows.length == 6)
    assert(rows.map(p => Set(p._1, p._2)).distinct.length == 6)
    rows.foreach { case (_, _, c, _) => assert(c >= -1.0 && c <= 1.0) }
    assert(rows.map(_._4).distinct.length == 1)
    assert(rows.head._4 > 0L)
  }

  test("q203: SCD2 versions tile each customer's history without overlap") {
    val rows = graft.SparkEntry.queries("q203_scd2_priority")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getDate(2), Option(r.getDate(3)),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2.toLocalDate.toEpochDay)
      // exactly one open (current) version per customer — the last
      assert(sorted.count(_._3.isEmpty) == 1)
      assert(sorted.last._4)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to), _), (_, from, _, _)) =>
          assert(to.toLocalDate.plusDays(1) == from.toLocalDate)
        case _ => ()
      }
    }
  }

  test("q204: shares sum to 1; within terms nonnegative") {
    val rows = graft.SparkEntry.queries("q204_theil_decomposition")(spark, Sf)
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4)
    // Theil within-group is a KL divergence — nonnegative up to rounding
    rows.foreach { case (_, tw) => assert(tw >= -1e-6) }
  }

  test("q205: top-20 scores descending; shared-order counts positive") {
    val rows = graft.SparkEntry.queries("q205_adamic_adar")(spark, Sf)
      .collect()
      .map(r => (r.getDouble(2), r.getLong(3)))
    assert(rows.length == 20)
    assert(rows.map(_._1).toSeq.sliding(2).forall {
      case Seq(a, b) => a >= b; case _ => true
    })
    rows.foreach { case (s, n) => assert(n >= 1 && s > 0.0) }
  }

  test("t34: class counts partition the text; entropy within ln(5)") {
    val rows = graft.SparkEntry.queries("t34_char_entropy")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tot = r.getLong(1)
      val parts = (2 to 6).map(r.getLong).sum
      assert(parts == tot)
      if (!r.isNullAt(7)) {
        val e = r.getDouble(7)
        assert(e >= 0.0 && e <= math.log(5.0) + 1e-9)
      }
    }
  }

  test("t35: sentence floor holds and bands match the score") {
    val rows = graft.SparkEntry.queries("t35_readability")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L)
      val band = r.getString(5)
      if (r.isNullAt(4)) assert(band == "no_text")
      else {
        val f = r.getDouble(4)
        val expected =
          if (f >= 90) "very_easy" else if (f >= 60) "plain"
          else if (f >= 30) "difficult" else "very_difficult"
        assert(band == expected)
      }
    }
  }
}
