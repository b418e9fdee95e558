package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q128/q129 batch: the bloom audit conserves
  * the customer split and respects structural bounds, and ACF values
  * stay inside the Cauchy–Schwarz envelope.
  */
class Round5sSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q128: split conserved; bounds hold; no-false-negative replay") {
    val r = q("q128_bloom_fpr_audit").collect().head
    val (nb, np, bits, nfp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nb + np === Tables.t(spark, Sf, "customer").count())
    assert(bits > 0 && bits <= math.min(4096L, 5L * nb))
    assert(nfp >= 0 && nfp <= np)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    // no false negatives: every build member hits all 5 of its bits —
    // replayed densely in Scala with the same double-hash scheme
    val members = Tables.t(spark, Sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(graft.functions.Md5Pack(col("c_custkey").cast("string")))
      .collect().map(_.getLong(0))
    val positions = members.flatMap { h =>
      val h1 = h % 1000003L; val h2 = 1L + (h / 2147483648L) % 999983L
      (0 until 5).map(i => (h1 + i * h2) % 4096L)
    }
    val bitset = positions.toSet
    assert(bitset.size.toLong === bits, "bit density does not replay")
    members.foreach { h =>
      val h1 = h % 1000003L; val h2 = 1L + (h / 2147483648L) % 999983L
      (0 until 5).foreach(i => assert(bitset((h1 + i * h2) % 4096L)))
    }
  }

  test("q129: lags complete; ACF inside the Cauchy-Schwarz envelope") {
    val rows = q("q129_autocorrelation").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 7L))
    val nDays = Tables.t(spark, Sf, "lineitem")
      .select(to_date(col("l_shipdate"))).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(1) < nDays)
      assert(math.abs(r.getDouble(2)) <= 1.0)
    }
  }
}
