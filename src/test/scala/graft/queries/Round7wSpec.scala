package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 65: imputation flags, cluster-cap keep
  * semantics, and the clip-prediction consistency of the gain audit.
  */
class Round7wSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q209: imputed iff zero orders; every customer appears once") {
    val rows = graft.SparkEntry.queries("q209_value_imputation")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, n, aov, imp) =>
      assert(imp == (n == 0L))
      assert(aov > 0L)
    }
  }

  test("d39: under-cap clusters keep exactly the keeper; over-cap keep all") {
    val rows = graft.SparkEntry.queries("d39_cluster_size_cap")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (keeper, ms) =>
      val size = ms.head._3
      assert(ms.length == size)
      if (size > 5) assert(ms.forall(m => m._4 && m._5))
      else {
        assert(ms.forall(!_._4))
        assert(ms.count(_._5) == 1)
        assert(ms.find(_._5).get._1 == keeper)
      }
    }
  }

  test("m19: gain direction matches rms vs target; clip count bounded") {
    val rows = graft.SparkEntry.queries("m19_loudness_gain")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
        r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, rms, gain, clips, safe) =>
      assert(rms > 0.0)
      // gain is rounded to 6dp before the product, so the residual is
      // bounded by 5e-7 * rms (rms can reach ~2e4 on loud clips)
      assert(math.abs(gain * rms - 3276.8) < 0.1)
      assert(clips >= 0 && clips <= n)
      assert(safe == (clips == 0L))
    }
  }
}
