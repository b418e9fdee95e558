package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q140/t28 batch: the LTV triangle conserves
  * revenue with monotone cumulative sums, and the Heaps exponent lands
  * in the sublinear-growth band.
  */
class Round5zSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q140: triangle conserves revenue; cumulative LTV monotone") {
    val rows = q("q140_cohort_ltv").collect()
    assert(rows.nonEmpty)
    val totalRev = rows.map(_.getDouble(3)).sum
    val expected = Tables.t(spark, Sf, "orders")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .collect().head.getDecimal(0).doubleValue()
    assert(math.abs(totalRev - expected) < 1e-6 * expected)
    rows.groupBy(_.getInt(0)).foreach { case (_, cohort) =>
      val byAge = cohort.sortBy(_.getInt(1))
      assert(byAge.head.getInt(1) === 0, "cohort must start at age 0")
      val cums = byAge.map(_.getDouble(4))
      assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
      // cum at each age replays as the prefix sum of rev
      val prefix = byAge.map(_.getDouble(3))
        .scanLeft(0.0)(_ + _).tail
      cums.zip(prefix).foreach { case (c, p) =>
        assert(math.abs(c - p) <= 1e-6 * math.max(1.0, math.abs(p))) }
    }
  }

  test("t28: Heaps exponent sublinear; checkpoint counts consistent") {
    val r = q("t28_heaps_law").collect().head
    assert(r.getLong(0) === 10L)
    val tokensFull = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " "))).count()
    val vocabFull = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " "))).distinct().count()
    assert(r.getLong(1) === tokensFull)
    assert(r.getLong(2) === vocabFull)
    // the synthetic corpus draws from a small fixed vocabulary that
    // saturates within the first checkpoint, so the true exponent is
    // ~0 here; a real web corpus sits near 0.5
    val beta = r.getDouble(3)
    assert(beta >= 0.0 && beta < 1.0,
      s"Heaps exponent $beta outside the sublinear band")
  }
}
