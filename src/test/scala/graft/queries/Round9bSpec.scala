package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the second round-6 batch: CUPED must not
  * increase variance, post-filter recall is a true fraction, and
  * aHash near-dup pairs include the corpus's planted exact duplicates
  * at Hamming 0.
  */
class Round9bSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q343: CUPED never raises a variance; arms tile the cohort") {
    val rows = q("q343_cuped").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).sorted.toSeq === Seq(0, 1))
    val nCust = Tables.t(spark, Sf, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum === nCust)
    rows.foreach { case (_, _, _, varY, _, varAdj) =>
      assert(varY >= 0 && varAdj >= 0)
    }
    // θ is the POOLED least-squares minimizer, so only the pooled
    // variance is guaranteed to shrink (a single arm can lose when the
    // X–Y correlation is weak). Recombine pooled E[y²] − E[y]² from the
    // per-arm moments and assert the guarantee there.
    def pooledVar(sel: ((Int, Long, Double, Double, Double, Double))
        => (Double, Double)): Double = {
      val n = rows.map(_._2).sum.toDouble
      val ey = rows.map(r => sel(r)._1 * r._2).sum / n
      val eyy = rows.map { r =>
        val (m, v) = sel(r); (v + m * m) * r._2
      }.sum / n
      eyy - ey * ey
    }
    val pv = pooledVar(r => (r._3, r._4))
    val pvAdj = pooledVar(r => (r._5, r._6))
    assert(pvAdj <= pv * (1 + 1e-9) + 1.0,
      s"pooled CUPED variance $pvAdj above raw $pv")
  }

  test("s37: recall is n_hit/n_truth and hits never exceed survivors") {
    val rows = q("s37_filtered_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length === 5)
    rows.foreach { case (p, nTruth, nSurv, nHit, recall) =>
      assert(nTruth >= 1 && nTruth <= 10)
      assert(nHit <= math.min(nTruth, nSurv), s"probe $p hit bound")
      assert(math.abs(recall - nHit.toDouble / nTruth) < 1e-12)
    }
  }

  test("m25: planted exact duplicates surface at Hamming 0; " +
    "all pairs within the verify threshold") {
    val rows = q("m25_ahash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty, "corpus's planted dups must produce pairs")
    rows.foreach { case (a, b, h) =>
      assert(a < b)
      assert(h >= 0 && h <= 3)
    }
    // identical text => identical fake pixels => identical hash
    val texts = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull && length(col("text")) >= 60)
      .groupBy("text").agg(count(lit(1)).as("c"),
        min("doc_id").as("a"), max("doc_id").as("b"))
      .filter(col("c") === 2)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val zeroPairs = rows.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    texts.foreach { p =>
      assert(zeroPairs.contains(p), s"planted dup $p missing at Hamming 0")
    }
  }
}
