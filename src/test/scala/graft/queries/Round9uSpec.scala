package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 120: bitemporal audit and histogram
  * quantiles.
  */
class Round9uSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q282: later transaction knowledge can only lower believed revenue") {
    val rows = graft.SparkEntry.queries("q282_bitemporal")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.length === 2)
    val (early, late) = (rows(0), rows(1))
    assert(early._2 === late._2,
      "valid-time population is the same at both snapshots")
    // Corrections are strictly downward (95%), recorded later — so the
    // later snapshot's belief is <= the earlier one's.
    assert(late._3 <= early._3 + 1e-9,
      s"late belief ${late._3} above early ${early._3}")
  }

  test("q283: histogram quantiles are ordered and bracket the data range") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q283_histogram_quantiles")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq === Seq("p50", "p95", "p99"))
    val byQ = rows.map(r => r._1 -> r._4).toMap
    assert(byQ("p50") <= byQ("p95") && byQ("p95") <= byQ("p99"),
      "quantile estimates are monotone")
    val mm = spark.read.parquet(s"$Sf/orders.parquet")
      .agg(min(col("o_totalprice")), max(col("o_totalprice")))
      .collect().head
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    rows.foreach { case (_, _, _, est) =>
      assert(est >= lo - 25000 && est <= hi + 25000,
        "estimates stay inside the (bucket-padded) observed range")
    }
  }
}
