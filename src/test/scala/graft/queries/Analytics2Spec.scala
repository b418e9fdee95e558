package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the sketch/sampling queries whose DuckDB oracle
  * proves parity but not *quality* — accuracy and distribution checks.
  */
class Analytics2Spec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.01"

  test("q38: KMV estimate lands within 25% of the exact distinct count") {
    val rows = graft.SparkEntry.queries("q38_kmv_distinct")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      assert(!r.isNullAt(2), s"group ${r.getString(0)} has < k distinct keys")
      val est = r.getDouble(2)
      assert(math.abs(est - exact) / exact < 0.25,
        s"KMV estimate $est too far from exact $exact for ${r.getString(0)}")
    }
  }

  test("q19: approx sketches land within bounds of the exact answers") {
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, Sf, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        expr("percentile(l_quantity, 0.5)").as("exact_median"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val approx = graft.SparkEntry.queries("q19_approx_sketches")(spark, Sf)
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (exOrders, _) = exact(r.getString(0))
      // the dumped row carries the exact distinct count plus the two
      // accuracy contracts the sketches must satisfy
      assert(r.getLong(1) === exOrders)
      assert(r.getBoolean(3), s"${r.getString(0)}: HLL bound violated")
      assert(r.getBoolean(4),
        s"${r.getString(0)}: median rank-interval bound violated")
    }
  }

  test("q39: hash sample is ~10% with buckets in [0, 10) and is deterministic") {
    val q = graft.SparkEntry.queries("q39_hash_sample")
    val sampled = q(spark, Sf).collect()
    val total = Tables.t(spark, Sf, "lineitem").count()
    val frac = sampled.length.toDouble / total
    assert(frac > 0.07 && frac < 0.13, s"sample fraction $frac not ~0.10")
    assert(sampled.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 10))
    // pure function of the key → identical on rerun
    assert(q(spark, Sf).collect().map(_.toSeq).toSeq ===
      sampled.map(_.toSeq).toSeq)
  }
}
