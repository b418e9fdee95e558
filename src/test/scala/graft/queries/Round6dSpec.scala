package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q147/q148 batch: ABC classes replay from a
  * sequential Pareto walk, and the Mann–Kendall statistic replays from
  * pairwise concordance over the monthly series.
  */
class Round6dSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q147: classes partition parts; replays from a sequential walk") {
    val rows = q("q147_abc_class").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq("A", "B", "C"))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    // sequential replay in scaled-integer (×10000) arithmetic
    val revs = Tables.t(spark, Sf, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(18,4)") * 10000).cast("long").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(x => (-x._2, x._1))
    val tot = revs.map(x => BigInt(x._2)).sum
    var cum = BigInt(0)
    val counts = scala.collection.mutable.Map(
      "A" -> 0L, "B" -> 0L, "C" -> 0L)
    revs.foreach { case (_, r) =>
      cum += r
      val cls = if (cum * 5 <= tot * 4) "A"
      else if (cum * 20 <= tot * 19) "B" else "C"
      counts(cls) += 1
    }
    rows.foreach { case (cls, n, _, _) =>
      assert(n === counts(cls), s"class $cls count")
    }
    assert(rows.map(_._2).sum === revs.length.toLong)
  }

  test("q148: S and Z replay from sequential pairwise concordance") {
    val r = q("q148_mann_kendall").collect().head
    val monthly = Tables.t(spark, Sf, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("rev"))
      .collect().map(x => (x.getTimestamp(0).getTime, x.getLong(1)))
      .sortBy(_._1)
    val n = monthly.length
    assert(r.getLong(0) === n.toLong)
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      val d = monthly(j)._2 - monthly(i)._2
      if (d > 0) s += 1 else if (d < 0) s -= 1
    }
    assert(r.getLong(1) === s, s"S ${r.getLong(1)} vs sequential $s")
    val varS = n.toDouble * (n - 1) * (2 * n + 5) / 18.0
    val z = if (s > 0) (s - 1) / math.sqrt(varS)
    else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
    assert(math.abs(r.getDouble(2) - z) < 1e-6,
      s"Z ${r.getDouble(2)} vs sequential $z")
  }
}
