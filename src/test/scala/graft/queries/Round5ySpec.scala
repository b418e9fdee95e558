package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q139/s14 batch: the drift series covers
  * every month with non-negative PSI, and the vector QA flags exactly
  * the >2σ set computed sequentially.
  */
class Round5ySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q139: all 12 months scored; counts conserve; PSI non-negative") {
    val rows = q("q139_monthly_psi_drift").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 12L))
    val nCur1996 = Tables.t(spark, Sf, "lineitem")
      .filter(year(col("l_shipdate")) === 1996).count()
    assert(rows.map(_.getLong(1)).sum === nCur1996)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("s14: outlier set matches the sequential 2-sigma model") {
    val rows = q("s14_vector_qa").collect()
    assert(rows.nonEmpty)
    val nEmb = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum === nEmb)
    // replay one label's outlier count from raw embeddings
    val target = rows.maxBy(_.getLong(1))
    val norms = Tables.t(spark, Sf, "embeddings")
      .filter(col("embedding").isNotNull &&
        col("label") === target.getInt(0))
      .select(col("embedding")).collect()
      .map { r =>
        val a = r.getSeq[Float](0).map(_.toDouble)
        val d = a.foldLeft(0.0)((acc, x) => acc + x * x)
        BigDecimal(math.sqrt(d)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
    val n = BigDecimal(norms.length)
    val s1 = norms.sum
    val s2 = norms.map(x => x * x).sum
    val expected = norms.count(x => {
      val lhs = n * x - s1
      lhs * lhs > 4 * (n * s2 - s1 * s1)
    }).toLong
    assert(target.getLong(3) === expected, "outlier set drifted")
    assert(target.getDouble(4) > 0.0)
  }
}
