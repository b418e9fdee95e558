package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the batch-42 queries: skyline dominance
  * invariants, growth-accounting conservation, drawdown sign.
  */
class Round7aSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q168: frontier points are mutually non-dominated and cover all parts") {
    val rows = graft.SparkEntry.queries("q168_skyline")(spark, Sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getAs[Number](2).longValue))
    val byBrand = rows.groupBy(_._1)
    byBrand.values.foreach { pts =>
      for ((_, p1, s1) <- pts; (_, p2, s2) <- pts
           if (p1, s1) != (p2, s2)) {
        val dominates = p2 <= p1 && s2 >= s1 && (p2 < p1 || s2 > s1)
        assert(!dominates, s"($p2,$s2) dominates frontier point ($p1,$s1)")
      }
    }
    // every part is equalled-or-dominated by some frontier point
    val parts = Tables.t(spark, Sf, "part")
      .select(col("p_brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").as("pc"), col("p_size"))
      .collect()
      .map(r => (r.getString(0), r.getDecimal(1).longValueExact,
        r.getAs[Number](2).longValue))
    parts.foreach { case (b, p, s) =>
      val front = byBrand.getOrElse(b, Array.empty)
      assert(front.exists { case (_, fp, fs) => fp <= p && fs >= s },
        s"part ($b,$p,$s) not covered by its brand frontier")
    }
  }

  test("q173: dau decomposes exactly into new + retained + resurrected") {
    val rows = graft.SparkEntry.queries("q173_growth_accounting")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, nw, ret, res) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(dau == nw + ret + res,
        s"day ${r.get(0)}: $dau != $nw+$ret+$res")
    }
    // churn ledger: total churn events = total users whose activity ends
    // before the horizon (every user eventually churns past max day)
    val totalChurn = rows.map(_.getLong(5)).sum
    val nUsers = Tables.t(spark, Sf, "events")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    // churn events >= distinct users (final churn) — gaps add more
    assert(totalChurn >= nUsers)
  }

  test("q171: drawdowns are non-negative and trough month is in range") {
    val rows = graft.SparkEntry.queries("q171_max_drawdown")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L)
      val mx = r.getLong(2)
      assert(mx > 1990L * 12 && mx < 2005L * 12, s"month index $mx")
    }
  }
}
