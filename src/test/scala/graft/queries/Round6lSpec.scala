package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q159/q160 batch: per-group quartiles replay
  * from sequential sorts, and the reconciliation totals replay from
  * independent per-side rollups.
  */
class Round6lSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q159: quartiles replay from a sequential per-group sort") {
    val rows = q("q159_latency_quartiles").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length === 15) // 5 priorities × 3 quartiles
    val perOrder = Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("ls"))
      .join(Tables.t(spark, Sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        datediff(col("ls"), to_date(col("o_orderdate"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.groupBy(_._1).foreach { case (prio, g) =>
      val sorted = perOrder(prio).sortBy(x => (x._3, x._2)).map(_._3)
      val n = sorted.length
      val expected = Map(
        "q1" -> sorted((n - 1) / 4),
        "median" -> sorted((n - 1) / 2),
        "q3" -> sorted(3 * (n - 1) / 4))
      g.foreach { case (_, quart, nOrders, days) =>
        assert(nOrders === n.toLong)
        assert(days === expected(quart),
          s"$prio $quart: $days vs ${expected(quart)}")
      }
    }
  }

  test("q160: reconciliation totals replay from per-side rollups") {
    val r = q("q160_revenue_reconciliation").collect().head
    val h = Tables.t(spark, Sf, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("c"))
      .collect().map(x => x.getTimestamp(0).getTime -> x.getLong(1)).toMap
    val l = Tables.t(spark, Sf, "lineitem")
      .join(Tables.t(spark, Sf, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("c"))
      .collect().map(x => x.getTimestamp(0).getTime -> x.getLong(1)).toMap
    val months = (h.keySet ++ l.keySet).toSeq
    assert(r.getLong(0) === months.length.toLong)
    val diffs = months.map(m =>
      BigInt(h.getOrElse(m, 0L)) - BigInt(l.getOrElse(m, 0L)))
    assert(r.getLong(1) === diffs.count(_ == 0).toLong)
    assert(BigInt(r.getLong(2)) === diffs.map(_.abs).max)
    assert(BigInt(r.getLong(3)) === diffs.sum)
  }
}
