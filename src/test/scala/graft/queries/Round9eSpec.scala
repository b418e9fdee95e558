package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 101: power-iteration PCA invariants. */
class Round9eSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("s31: second component orthogonal, subordinate, unit-norm") {
    val r = graft.SparkEntry.queries("s31_pca_two")(spark, Sf)
      .collect().head
    val l1 = r.getDouble(1); val l2 = r.getDouble(2)
    val share2 = r.getDouble(3); val ortho = r.getDouble(4)
    val v2 = (0 until 8).map(i => r.getDouble(5 + i))
    // Fixed 6-iteration estimates: on a near-flat spectrum (50 vectors
    // at sf0.001) the unconverged lambda1 can sit a hair below the
    // orthogonal-complement maximum, so the ordering holds only to a
    // small tolerance.
    assert(l2 > 0.0 && l2 <= l1 + 5e-4)
    assert(share2 > 0.0 && share2 < 1.0)
    assert(math.abs(ortho) < 1e-5, s"v1 residue survived: $ortho")
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-4)
    assert(v2.head >= 0.0)
  }

  test("s30: ndcg bounded in [0,1], zero exactly when no relevant hits") {
    val rows = graft.SparkEntry.queries("s30_ndcg")(spark, Sf)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (hits, total, ndcg) =>
      assert(hits >= 0 && hits <= 10 && hits <= total)
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert((ndcg == 0.0) === (hits == 0L))
    }
  }

  test("s29: unit-norm sign-fixed eigenvector, dominant variance share") {
    val r = graft.SparkEntry.queries("s29_pca_power")(spark, Sf)
      .collect().head
    val n = r.getLong(0)
    val lambda = r.getDouble(1)
    val share = r.getDouble(2)
    val v = (0 until 8).map(i => r.getDouble(3 + i))
    assert(n > 0)
    assert(lambda > 0.0, "top eigenvalue of a covariance matrix is > 0")
    // The top component explains at least the average share (1/d) and
    // at most everything.
    assert(share >= 1.0 / 8 - 1e-6 && share <= 1.0 + 1e-6)
    assert(v.head >= 0.0, "sign convention pins v[0] >= 0")
    val norm2 = v.map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"norm^2 = $norm2")
  }
}
