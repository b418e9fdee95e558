package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for q163: deciles tile the customer base, the curve
  * is convex (ascending-revenue order), and it ends at exactly 1.
  */
class Round6oSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q163: convex Lorenz curve tiling all customers, ending at 1") {
    val rows = graft.SparkEntry.queries("q163_lorenz_points")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val nCust = Tables.t(spark, Sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_._2).sum === nCust)
    // decile sizes balanced within 1
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    val shares = rows.map(_._4)
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // convexity: per-decile increments never shrink (ascending order)
    val incs = shares.head +: shares.zip(shares.tail).map(p => p._2 - p._1)
    assert(incs.zip(incs.tail).forall { case (a, b) => b >= a - 1e-6 },
      s"non-convex increments: ${incs.mkString(",")}")
    // with skewed revenue the top decile holds well over 10%
    assert(incs.last > 0.1)
  }
}
