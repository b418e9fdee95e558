package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the rank-statistics batch (q144/q145/q146):
  * each statistic replays from a sequential in-memory model, so the
  * distributed rank plumbing (GlobalPrefixSum, midranks, pair joins)
  * is checked against textbook formulas — not just against the oracle.
  */
class Round6cSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  private def custRevenueCents: Array[Long] =
    Tables.t(spark, Sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("cents"))
      .collect().map(_.getLong(1))

  test("q144: Gini replays from the sorted sequential formula") {
    val r = q("q144_gini").collect().head
    val xs = custRevenueCents.sorted
    val n = xs.length
    assert(r.getLong(0) === n.toLong)
    val tot = xs.map(BigInt(_)).sum
    val rx = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = 2.0 * rx.toDouble / (n.toDouble * tot.toDouble) -
      (n + 1).toDouble / n
    assert(math.abs(r.getDouble(2) - gini) < 1e-6,
      s"gini ${r.getDouble(2)} vs sequential $gini")
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
  }

  test("q145: tau replays from pairwise concordance over nation ranks") {
    val r = q("q145_kendall_tau").collect().head
    val nk = r.getLong(0); val conc = r.getLong(1); val disc = r.getLong(2)
    assert(nk === 25L)
    assert(conc + disc <= nk * (nk - 1) / 2)
    val tau = (conc - disc).toDouble / (nk.toDouble * (nk - 1) / 2.0)
    assert(math.abs(r.getDouble(3) - tau) < 1e-6)
    assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
  }

  test("q146: AUC replays from sequential midranks; probability range") {
    val r = q("q146_auc").collect().head
    val data = Tables.t(spark, Sf, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long"), col("o_orderpriority") === "1-URGENT")
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val nPos = data.count(_._2).toLong
    val nNeg = data.length - nPos
    assert(r.getLong(0) === nPos && r.getLong(1) === nNeg)
    // sequential midranks over the sorted scores
    val ranks = scala.collection.mutable.Map.empty[Long, Double]
    val sorted = data.map(_._1).sorted
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j) == sorted(i)) j += 1
      ranks(sorted(i)) = (i + 1 + j) / 2.0
      i = j
    }
    val rPos = data.filter(_._2).map(d => ranks(d._1)).sum
    val auc = (rPos - nPos.toDouble * (nPos + 1) / 2.0) /
      (nPos.toDouble * nNeg.toDouble)
    assert(math.abs(r.getDouble(2) - auc) < 1e-6,
      s"auc ${r.getDouble(2)} vs sequential $auc")
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0)
  }
}
