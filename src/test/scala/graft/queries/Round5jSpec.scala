package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q114/q115/m10 batch: audit counts replay,
  * session KPIs reconcile with q13's sessionization, and VAD segment
  * invariants hold per media.
  */
class Round5jSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q114: row counts and uniqueness violations replay; flags honest") {
    val rows = q("q114_constraint_audit").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toMap
    assert(rows.size === 8)
    val nOrders = Tables.t(spark, Sf, "orders").count()
    val nLine = Tables.t(spark, Sf, "lineitem").count()
    val nCust = Tables.t(spark, Sf, "customer").count()
    rows.foreach { case (name, (table, n, v, passed)) =>
      val expected = table match {
        case "orders" => nOrders
        case "lineitem" => nLine
        case "customer" => nCust
      }
      assert(n === expected, s"$name row count")
      assert(passed === (v == 0L), s"$name flag")
      assert(v >= 0)
    }
    val dupOrders = nOrders -
      Tables.t(spark, Sf, "orders").select("o_orderkey").distinct().count()
    assert(rows("orders.orderkey_unique")._3 === dupOrders)
  }

  test("q115: KPIs reconcile with q13's sessionization") {
    val kpis = q("q115_session_kpis").collect()
    val sessions = q("q13_sessionize").collect()
    assert(kpis.map(_.getLong(1)).sum === sessions.length.toLong)
    val bounces = sessions.count(_.getLong(2) == 1L).toLong
    assert(kpis.map(_.getLong(2)).sum === bounces)
    kpis.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("m10: segment invariants hold; window counts match sample math") {
    val rows = q("m10_vad_segments").collect()
    assert(rows.length === 500)
    val nsmp = Tables.t(spark, Sf, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        (octet_length(encode(concat(col("text"), lit("ÿÿ")), "UTF-8")) / 2)
          .cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (id, nw, na, ns, lg) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(nw === (nsmp(id) + 63) / 64, s"media $id window count")
      assert(na <= nw)
      assert(ns <= na && lg <= na)
      assert((ns > 0) === (na > 0), s"media $id segment/active mismatch")
      if (ns > 0) assert(lg >= (na + ns - 1) / ns, s"media $id longest")
    }
    assert(rows.exists(_.getLong(3) > 1), "no media with multiple segments")
  }
}
