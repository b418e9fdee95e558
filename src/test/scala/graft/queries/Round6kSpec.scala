package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the d29/q158 batch: the funnel is monotone and
  * coheres with its component queries; the cardinality estimate is a
  * per-bucket upper bound that replays sequentially.
  */
class Round6kSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("d29: funnel is monotone non-increasing and coheres with tiers") {
    val rows = q("d29_dedup_funnel").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).toSeq ==
      Seq("raw", "exact_unique", "neardup_kept"))
    val ns = rows.map(_._3)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel not monotone: $ns")
    assert(rows(0)._4 === 0L)
    assert(rows(1)._4 === ns(0) - ns(1))
    assert(rows(2)._4 === ns(1) - ns(2))
    assert(ns(0) === 500L)
    val d12Kept = graft.SparkEntry.queries("d12_keep_list")(spark, Sf)
      .filter(col("keep")).count()
    assert(ns(2) === d12Kept)
  }

  test("q158: estimate replays sequentially and upper-bounds actual") {
    val r = q("q158_join_card_est").collect().head
    assert(r.getInt(0) === 64)
    val est = r.getDouble(1).toLong
    val actual = r.getLong(2)
    val oKeys = Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val lKeys = Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val h1 = oKeys.groupBy(_ % 64).map { case (b, g) => b -> g.length }
    val h2 = lKeys.groupBy(_ % 64).map { case (b, g) => b -> g.length }
    val expEst = h1.map { case (b, c1) =>
      BigInt(c1) * BigInt(h2.getOrElse(b, 0))
    }.sum
    assert(BigInt(est) === expEst)
    val lCounts = lKeys.groupBy(identity).map { case (k, g) => k -> g.length }
    val expActual = oKeys.map(k => lCounts.getOrElse(k, 0).toLong).sum
    assert(actual === expActual)
    // orderkey is unique per order, so bucket products over-count:
    // the estimate is an upper bound on the true cardinality
    assert(est >= actual)
    assert(math.abs(r.getDouble(3) - est.toDouble / actual) < 1e-6)
  }
}
