package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the s19/q166 batch: the persisted index
  * reproduces the in-memory search verbatim, and the erasure cascade
  * is exactly the subject closure.
  */
class Round6rSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("s19: reloaded index reproduces s3's ranking verbatim") {
    val viaIndex = q("s19_ivf_index_roundtrip").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val direct = q("s3_ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(viaIndex.toSeq == direct.toSeq,
      "persisted-and-reloaded index diverged from the in-memory build")
    // the index file on disk really is tiny (KBs, corpus-independent)
    val scratch = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_s19", "sf0.001")
    val bytes = scratch.toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(bytes > 0 && bytes < 1024 * 1024, s"index size $bytes")
  }

  test("q166: cascade counts equal the subject closure; tiers nest") {
    val rows = q("q166_gdpr_erasure_audit").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._2).toSeq == Seq("customer", "orders", "lineitem"))
    val subjects = Tables.t(spark, Sf, "customer")
      .filter(col("c_custkey") % 1000 === 7)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    assert(rows(0)._3 === subjects.size.toLong)
    val orderRows = Tables.t(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hitOrders = orderRows.filter(o => subjects(o._2)).map(_._1).toSet
    assert(rows(1)._3 === hitOrders.size.toLong)
    val hitLines = Tables.t(spark, Sf, "lineitem")
      .select(col("l_orderkey")).collect()
      .count(r => hitOrders(r.getLong(0)))
    assert(rows(2)._3 === hitLines.toLong)
    rows.foreach { case (_, _, erased, total, share) =>
      assert(share > 0.0 && share < 1.0)
      assert(math.abs(share - erased.toDouble / total) < 1e-6)
    }
  }
}
