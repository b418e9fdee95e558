package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pin for s22: recall must not decrease as more inverted
  * lists are probed.
  */
class Round7nSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("s22: recall is monotone in nprobe and bounded by 1") {
    val rows = graft.SparkEntry.queries("s22_nprobe_curve")(spark, Sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 8))
    rows.foreach { case (_, hits, ex, rec) =>
      assert(hits <= ex)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    rows.sliding(2).foreach {
      case Array((_, _, _, r1), (_, _, _, r2)) => assert(r2 >= r1 - 1e-9)
      case _ =>
    }
  }
}
