package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q141/q142 batch: the CSV round-trip loses
  * nothing against the source frame, and the proration conserves the
  * budget to the cent.
  */
class Round6aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q141: parse-back equals the source rows field by field") {
    val parsed = q("q141_csv_roundtrip").collect()
    val src = Tables.t(spark, Sf, "orders")
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)"),
        to_date(col("o_orderdate")))
      .orderBy("o_orderkey").collect()
    assert(parsed.length === src.length && parsed.nonEmpty)
    parsed.zip(src).foreach { case (p, s) =>
      assert(p.getLong(0) === s.getLong(0))
      assert(p.getLong(1) === s.getLong(1))
      assert(p.getString(2) === s.getString(2))
      assert(p.getDouble(3) === s.getDecimal(3).doubleValue())
      assert(p.getDate(4) === s.getDate(4))
    }
  }

  test("q142: allocation conserves the budget; floors honored") {
    val rows = q("q142_largest_remainder").collect()
    assert(rows.length === 25)
    assert(rows.map(_.getLong(4)).sum === 100000000L,
      "allocations must sum exactly to the budget")
    val totalW = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(r.getLong(3) === 0L || r.getLong(3) === 1L)
      assert(r.getLong(4) === r.getLong(2) + r.getLong(3))
      // floor share is exactly ⌊B·w/W⌋
      val expected = (BigInt(100000000L) * r.getLong(1) / totalW).toLong
      assert(r.getLong(2) === expected)
    }
    assert(rows.map(_.getLong(3)).sum < 25L)
  }
}
