package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for batch 51: BM25 ordering/term coverage and
  * prefix-cache savings arithmetic.
  */
class Round7jSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("s21: scores positive and non-increasing; top doc contains a query term") {
    val rows = graft.SparkEntry.queries("s21_bm25")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, s) => assert(s > 0.0) }
    val scores = rows.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse))
    val topDoc = Tables.t(spark, Sf, "documents")
      .filter(col("doc_id") === rows.head._1)
      .select(col("text")).collect().head.getString(0)
    assert(Seq("spark", "join", "window").exists(topDoc.split(" ").contains),
      "top-ranked doc contains none of the query terms")
  }

  test("t32: savings = (n-1) * prefix_len, prefixes genuinely shared") {
    val rows = graft.SparkEntry.queries("t32_prefix_cache_savings")(
      spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (n, plen, saved) =>
      assert(n >= 2)
      assert(plen > 0 && plen <= 64)
      assert(saved == (n - 1) * plen)
    }
  }
}
