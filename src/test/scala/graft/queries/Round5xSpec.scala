package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the q137/q138 batch: ledger invariants hold and
  * weighted quantiles match a sequential weighted-scan model.
  */
class Round5xSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, Sf)

  test("q137: ledger invariants; worst drawdowns sorted") {
    val rows = q("q137_stock_balance").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val mins = rows.map(_.getLong(1))
    assert(mins.sameElements(mins.sorted))
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "min balance above final")
      assert(r.getLong(4) <= r.getLong(3))
      if (r.getLong(1) < 0) assert(r.getLong(4) >= 1)
    }
    // replay one part's ledger sequentially
    val part = rows.head.getLong(0)
    val deltas = Tables.t(spark, Sf, "lineitem")
      .filter(col("l_partkey") === part)
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .select(when(col("l_returnflag") === "R",
        col("l_quantity").cast("long"))
        .otherwise(-col("l_quantity").cast("long"))).collect()
      .map(_.getLong(0))
    val balances = deltas.scanLeft(0L)(_ + _).tail
    assert(rows.head.getLong(1) === balances.min)
    assert(rows.head.getLong(2) === balances.last)
    assert(rows.head.getLong(4) === balances.count(_ < 0).toLong)
  }

  test("q138: weighted quantiles match the sequential weighted scan") {
    val rows = q("q138_weighted_median").collect()
    assert(rows.map(_.getDouble(0)).toSeq === Seq(0.25, 0.5, 0.75))
    val data = Tables.t(spark, Sf, "lineitem")
      .select("l_extendedprice", "l_orderkey", "l_linenumber", "l_quantity")
      .collect()
      .map(r => ((r.getDouble(0), r.getLong(1), r.getInt(2)),
        r.getDouble(3).toLong))
      .sortBy(_._1)
    val tw = data.map(_._2).sum
    rows.foreach { r =>
      assert(r.getLong(2) === tw)
      val target = r.getLong(1)
      var cum = 0L
      val v = data.find { case (_, w) => cum += w; cum >= target }.get._1._1
      assert(r.getDouble(3) === v, s"weighted q${r.getDouble(0)}")
    }
  }
}
