package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the d28/q149/q150 batch: survivorship elections
  * obey their priority rules, and the lifecycle KPIs replay from
  * sequential per-order / per-customer models.
  */
class Round6eSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("d28: canonical doc is the longest member; source rank is min") {
    val golden = q("d28_golden_record").collect()
    assert(golden.nonEmpty)
    val members = graft.SparkEntry.queries("d8_dedup_clusters")(spark, Sf)
      .join(Tables.t(spark, Sf, "documents"), "doc_id")
      .select(col("cluster_keeper"), col("doc_id"), col("n_chars"),
        col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(golden.length === members.size)
    golden.foreach { r =>
      val (keeper, n, canon, src, totChars) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getLong(4))
      val mem = members(keeper)
      assert(n === mem.length.toLong)
      assert(totChars === mem.map(_._3).sum)
      // longest text wins, doc_id breaks ties downward
      val expCanon = mem.minBy(m => (-m._3, m._2))._2
      assert(canon === expCanon, s"cluster $keeper canonical")
      val expSrc = mem.minBy(m => (m._4.drop(3).toLong, m._2))._4
      assert(src === expSrc, s"cluster $keeper source")
    }
  }

  test("q149: priorities cover all orders; avg replays sequentially") {
    val rows = q("q149_cycle_time").collect()
    assert(rows.length === 5)
    val perOrder = Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("ls"))
      .join(Tables.t(spark, Sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("ls"), to_date(col("o_orderdate"))))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val ds = perOrder(r.getString(0)).map(_._2)
      assert(r.getLong(1) === ds.length.toLong)
      assert(math.abs(r.getDouble(2) -
        ds.map(_.toLong).sum.toDouble / ds.length) < 1e-6)
      assert(r.getInt(3) === ds.max)
    }
  }

  test("q150: only repeat customers count; intervals are positive") {
    val rows = q("q150_repeat_interval").collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) > 0.0)
      // a mean inter-order gap beyond the ~7y data window is impossible
      assert(r.getDouble(2) < 2600.0)
    }
  }
}
