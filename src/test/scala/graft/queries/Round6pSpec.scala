package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for q164: credit conservation (every purchase's
  * value is fully distributed, up to per-credit rounding) and channel
  * coherence with the event stream.
  */
class Round6pSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("q164: credits conserve purchase value; channels are coherent") {
    val rows = graft.SparkEntry.queries("q164_linear_attribution")(
      spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val channels = rows.map(_._1).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")))
    assert(channels.contains("direct") || channels.size == 2)
    val totalAttr = rows.map(_._3).sum
    val totalPurch = Tables.t(spark, Sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value"), 6).cast("decimal(18,6)"))
        .cast("double"))
      .collect().head.getDouble(0)
    // each credit rounds to 1e-6; with ~thousands of credits the
    // conservation drift stays far below a cent-scale tolerance
    assert(math.abs(totalAttr - totalPurch) < 0.5,
      s"attributed $totalAttr vs purchases $totalPurch")
    rows.foreach { case (_, n, v) => assert(n > 0 && v > 0.0) }
  }
}
