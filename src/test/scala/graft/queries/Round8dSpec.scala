package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 74: JSON roundtrip totals and the diff
  * status partition.
  */
class Round8dSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q224: shredded totals equal the direct aggregation") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q224_json_shred_roundtrip")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Tables.t(spark, Sf, "lineitem")
      .filter(col("l_orderkey") < 500)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("q225: statuses partition the customer set; unchanged has zero delta") {
    val rows = graft.SparkEntry.queries("q225_snapshot_diff")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byStatus = rows.map(r => r._1 -> r).toMap
    assert(rows.map(_._2).sum > 0)
    byStatus.get("unchanged").foreach { case (_, _, oa, sa) =>
      assert(oa == 0L && sa == 0L)
    }
    byStatus.get("changed").foreach { case (_, n, oa, _) =>
      assert(n > 0 && oa > 0)
    }
  }
}
