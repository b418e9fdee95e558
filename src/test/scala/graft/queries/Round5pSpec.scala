package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q126/q127 batch: the grid prune loses no
  * pair against in-engine brute force, and the rank transform is a
  * monotone permutation.
  */
class Round5pSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q126: grid join equals brute force; pairs canonical") {
    val rows = q("q126_grid_neighbor_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (a, b, d2) =>
      assert(a < b); assert(d2 <= 225L)
    }
    assert(rows.distinct.length === rows.length, "duplicate pairs")
    val pts = Tables.t(spark, Sf, "customer")
      .select(col("c_custkey").as("id"),
        (graft.functions.Md5Pack(col("c_custkey").cast("string")) % 1000)
          .as("x"),
        (graft.functions.Md5Pack(concat(col("c_custkey").cast("string"),
          lit(":y"))) % 1000).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ai, ax, ay) <- pts; (bi, bx, by) <- pts
      if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= 225L
    } yield (ai, bi, d2)).sortBy(p => (p._1, p._2))
    assert(rows.toSeq === brute.toSeq, "grid prune dropped or added pairs")
  }

  test("q127: exact mid-rank quantiles form a monotone permutation") {
    val rows = q("q127_quantile_normalize").collect()
    val n = rows.length
    assert(n.toLong === Tables.t(spark, Sf, "customer").count())
    assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to n).toSeq)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
      assert(r.getDouble(3) ===
        ((r.getLong(2) - 0.5) / n * 1e6).round / 1e6)
    }
    // monotone: higher balance never gets a lower rank
    val byBal = rows.sortBy(r => (r.getDouble(1), r.getLong(0)))
    val ranks = byBal.map(_.getLong(2))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a < b })
  }
}
