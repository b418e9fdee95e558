package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q136/d26 batch: rank-selected quartiles
  * match sort-based quantiles, and the bloom front-filter loses no
  * true duplicate.
  */
class Round5wSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q136: rank-selected quartiles equal the sorted-array answer") {
    val rows = q("q136_scalable_median").collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.25, 0.5, 0.75))
    val sorted = Tables.t(spark, Sf, "lineitem")
      .select("l_extendedprice", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getInt(2)))
      .sortBy(identity).map(_._1)
    val n = sorted.length
    rows.foreach { r =>
      val target = r.getLong(1).toInt
      assert(r.getLong(2) === n.toLong)
      assert(r.getDouble(3) === sorted(target - 1),
        s"quantile ${r.getDouble(0)} value")
    }
  }

  test("d26: bloom front-filter has no false negatives; counts replay") {
    val r = q("d26_bloom_dedup").collect().head
    val (nOld, nNew, nCand, nDup, nFp) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val docs = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("hm")).collect()
      .map(x => x.getLong(0) -> x.getString(1))
    val oldH = docs.filter(_._1 % 5 != 0).map(_._2).toSet
    // fresh batch = the %5 slice plus planted re-submissions (%25 == 3)
    val freshDocs = docs.filter(_._1 % 5 == 0) ++
      docs.filter(_._1 % 25 == 3)
    assert(nOld === docs.count(_._1 % 5 != 0).toLong)
    assert(nNew === freshDocs.length.toLong)
    // exact duplicate count — blooms must find every one of these
    val trueDups = freshDocs.count(d => oldH(d._2)).toLong
    assert(nDup === trueDups, "bloom filter dropped a true duplicate")
    assert(nCand === nDup + nFp)
    assert(nCand <= nNew)
    assert(trueDups > 0, "fixture has no cross-batch duplicates to find")
  }
}
