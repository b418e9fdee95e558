package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 64: decayed-popularity bounds, novelty
  * ratios, and envelope integrity against the m7 whole-clip features.
  */
class Round7vSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q208: decayed score is positive and bounded by the event count") {
    val rows = graft.SparkEntry.queries("q208_recency_popularity")(spark, Sf)
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, s) =>
      assert(s > 0.0 && s <= n.toDouble + 1e-9)
    }
  }

  test("t37: novelty ratios consistent with counts") {
    val rows = graft.SparkEntry.queries("t37_shingle_novelty")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u, nov) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u <= n)
      assert(math.abs(nov - u.toDouble / n) < 1e-5)
    }
  }

  test("m18: 8 buckets per clip; bucket energies sum to the m7 total") {
    val env = graft.SparkEntry.queries("m18_waveform_envelope")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    val perClip = env.groupBy(_._1)
    perClip.foreach { case (_, bs) => assert(bs.length == 8) }
    val m7 = graft.SparkEntry.queries("m7_pcm_features")(spark, Sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    perClip.foreach { case (id, bs) =>
      val (energy, peak) = m7(id)
      assert(bs.map(_._3).sum == energy)
      assert(bs.map(_._2).max == peak)
    }
  }
}
