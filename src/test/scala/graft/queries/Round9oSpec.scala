package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 114: Mann–Whitney U and McNemar. */
class Round9oSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q271: U is within [0, na*nb] and z matches the U recomputation") {
    val r = graft.SparkEntry.queries("q271_mann_whitney")(spark, Sf)
      .collect().head
    val (na, nb, u, z) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(na > 0 && nb > 0)
    assert(u >= 0.0 && u <= na.toDouble * nb, "U is a rank statistic bound")
    // Under exchangeable groups z should be a sane magnitude; the pin is
    // the sign identity: z > 0 iff U exceeds its null mean.
    val mu = na.toDouble * nb / 2
    if (u != mu) assert((z > 0) === (u > mu), "z sign tracks U - mean")
  }

  test("q271: hand-check on a tiny two-group sample") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A = {1, 3, 5}, B = {2, 4} → ranks 1..5, R_A = 1+3+5 = 9, U_A = 3.
    val df = Seq((1, true), (3, true), (5, true), (2, false), (4, false))
      .toDF("v", "in_a")
    val byVal = df.groupBy("v").agg(
      count_if(col("in_a")).as("ca"), count(lit(1)).as("t"))
    val ranked = graft.operators.GlobalPrefixSum
      .withRunningTotal(byVal, "v", "t", "cum")
    val r2a = ranked
      .agg(sum(expr("ca * (2 * cum - t + 1)")).as("r2a"))
      .collect().head.getLong(0)
    assert(r2a === 18L, "twice the A rank-sum of 9")
  }

  test("q272: discordant cells are consistent and bounded by n_test") {
    val r = graft.SparkEntry.queries("q272_mcnemar")(spark, Sf)
      .collect().head
    val (n, b, c, stat) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(n > 0 && b >= 0 && c >= 0 && b + c <= n)
    if (b + c > 0) {
      val expect = (math.abs(b - c) - 1.0) * (math.abs(b - c) - 1.0) / (b + c)
      assert(math.abs(stat - expect) < 1e-5)
    }
  }
}
