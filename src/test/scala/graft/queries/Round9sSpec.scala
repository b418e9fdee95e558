package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 118: Haar, decision stump, naive Bayes. */
class Round9sSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q278: Haar reconstruction — approx + details recover the series") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q278_haar")(spark, Sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    assert(rows.length === 16, "15 details + 1 approx for 16 samples")
    assert(rows.count(_._3 == "approx") === 1)
    // Inverse transform: start from the approx, refine with details.
    var vals = Map(0L -> rows.find(_._3 == "approx").get._4)
    for (lvl <- 4 to 1 by -1) {
      val det = rows.filter(r => r._1 == lvl && r._3 == "detail")
        .map(r => r._2 -> r._4).toMap
      vals = vals.flatMap { case (i, a) =>
        val d = det(i)
        Map(2 * i -> (a + d), 2 * i + 1 -> (a - d))
      }
    }
    // Compare against the directly computed monthly cents series.
    val monthly = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(trunc(col("o_orderdate"), "month").as("mon"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .orderBy("mon").limit(16)
      .collect().map(_.getLong(1))
    monthly.zipWithIndex.foreach { case (cents, i) =>
      assert(math.abs(vals(i.toLong) - cents / 100.0) < 0.01,
        s"month $i reconstructs")
    }
  }

  test("q279: gain is nonnegative and the split counts nest") {
    val r = graft.SparkEntry.queries("q279_stump")(spark, Sf)
      .collect().head
    val (n, np, gRoot, th, gSplit, gain, nl, npl) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7))
    assert(np <= n && nl <= n && npl <= math.min(nl, np))
    assert(gRoot >= 0 && gRoot <= 0.5 + 1e-9)
    assert(gSplit >= -1e-9, "weighted Gini is nonnegative")
    assert(gain >= -1e-6, "the best split cannot be worse than no split")
    assert(Seq(50000, 100000, 150000, 200000, 250000, 300000, 350000,
      400000).contains(th))
  }

  test("q280: per-class accuracies are consistent and bounded") {
    val rows = graft.SparkEntry.queries("q280_naive_bayes")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, a) =>
      assert(c >= 0 && c <= n && n > 0)
      assert(math.abs(a - c.toDouble / n) < 1e-5)
    }
    // The majority class should be predicted at least once overall.
    assert(rows.map(_._3).sum > 0, "classifier beats the empty baseline")
  }
}
