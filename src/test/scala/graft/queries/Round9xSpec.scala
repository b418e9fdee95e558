package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 123: skew report and moment merge. */
class Round9xSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q287: loads and heavy keys are consistent with the raw counts") {
    val rows = graft.SparkEntry.queries("q287_skew_report")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getAs[Number](1).longValue(),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getDouble(6)))
    assert(rows.length === 5)
    assert(rows.map(_._1).toSeq === (1 to 5))
    val total = spark.read.parquet(s"$Sf/lineitem.parquet").count()
    rows.foreach { case (_, _, keyRows, nRows, nParts, maxLoad, skew) =>
      assert(nRows === total)
      assert(maxLoad * nParts >= nRows, "max load is at least the mean")
      assert(skew >= 1.0 - 1e-6, "skew factor is >= 1 by definition")
      assert(keyRows > 0 && keyRows <= maxLoad * 2,
        "a single key cannot dwarf its own partition implausibly")
    }
    // Ranked heavy keys never increase in count.
    rows.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _           =>
    }
  }

  test("q288: merged moments equal the whole-corpus variance") {
    val r = graft.SparkEntry.queries("q288_moment_merge")(spark, Sf)
      .collect().head
    val (n, variance) = (r.getLong(0), r.getDouble(3))
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
    assert(n === o.count())
    val vals = o.collect().map(_.getLong(0).toDouble)
    val mean = vals.sum / vals.length
    val popVar = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
    assert(math.abs(variance - popVar / 10000) < math.abs(popVar) * 1e-6,
      s"merged-moment variance $variance vs direct ${popVar / 10000}")
  }
}
