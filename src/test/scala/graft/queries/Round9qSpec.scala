package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for batch 116: attribution models and k-means. */
class Round9qSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q275: each model distributes ~one credit unit per journey") {
    val rows = graft.SparkEntry.queries("q275_attribution")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val (ft, lt, lin, ush) =
      (rows.map(_._3).sum, rows.map(_._4).sum,
        rows.map(_._5).sum, rows.map(_._6).sum)
    // First-touch and last-touch each assign exactly one unit per
    // journey-with-touches, so their totals agree; fractional models
    // sum to the same journey count within rounding slack.
    assert(ft === lt, "first/last totals both count journeys once")
    assert(math.abs(lin - ft) < 0.01, s"linear total $lin vs $ft journeys")
    assert(math.abs(ush - ft) < 0.01, s"u-shape total $ush vs $ft journeys")
    assert(rows.map(_._1).toSet.subsetOf(
      Set("click", "view", "signup", "error")), "purchase never a touch")
  }

  test("s32: k-means invariants — partition sizes, inertia decrease") {
    val rows = graft.SparkEntry.queries("s32_kmeans")(spark, Sf)
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getDouble(2)))
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(_._2).sum
    val nVec = spark.read.parquet(s"$Sf/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .count()
    assert(total === nVec, "every vector is assigned to exactly one cluster")
    rows.foreach { case (_, n, inertia) =>
      assert(n > 0); assert(inertia >= 0.0)
    }
  }
}
