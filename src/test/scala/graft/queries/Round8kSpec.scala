package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 81: domain checks hold with real counts
  * and the dedup filter actually excludes dropped candidates.
  */
class Round8kSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q235: six checks, zero violations, full row coverage") {
    val rows = graft.SparkEntry.queries("q235_domain_checks")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 6)
    val n = rows.head._2
    rows.foreach { case (_, rn, v) =>
      assert(rn == n && n > 0)
      assert(v == 0L)
    }
  }

  test("s28: no returned candidate is a d14 drop; 5 per probe") {
    import org.apache.spark.sql.functions._
    val res = graft.SparkEntry.queries("s28_dedup_filtered_search")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(res.length == 50)
    val dropped = graft.SparkEntry.queries("d14_embedding_keep_list")(
      spark, Sf).filter(!col("keep"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    res.foreach { case (_, cand) => assert(!dropped.contains(cand)) }
  }
}
