package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the native as-of join physical operator. */
class AsOfJoinPlanSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("native exec and the composition operator agree on q28's workload") {
    val native = graft.SparkEntry.queries("q284_asof_native")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val composed = graft.SparkEntry.queries("q28_asof_join")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native === composed,
      "two implementations, one contract: results must be identical")
  }

  test("the physical plan contains AsOfJoinExec with planned exchanges") {
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Tables.events(spark, Sf)
    val l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("right_user_id"),
        col("event_id").as("cid"), col("ts").as("cts"))
    val df = AsOfJoinPlan.asof(l, r, Seq("user_id"), "ts", "cts",
      rightTiebreak = Seq("cid"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), s"native node missing:\n$plan")
    assert(plan.contains("Exchange"),
      "EnsureRequirements must plan the co-partitioning exchanges")
    assert(plan.contains("Sort"),
      "EnsureRequirements must plan the (key, time) sorts")
  }

  test("merge semantics on a hand-built frame: ties, nulls, no-match") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"),
      (3L, 7L, "d")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100L), (1L, 10L, 101L), // tie at t=10: 101 must win
      (1L, 15L, 102L),
      (2L, 9L, 103L),                   // after left t=5: no match
    ).toDF("right_k", "rt", "rid")
    val out = AsOfJoinPlan.asof(left, right, Seq("k"), "t", "rt",
      rightTiebreak = Seq("rid"))
      .select(col("tag"), col("rid"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("a") === Some(101L), "equal-time tie keeps the highest rid")
    assert(out("b") === Some(102L), "later left row advances to t=15")
    assert(out("c") === None, "right row in the future never matches")
    assert(out("d") === None, "key with no right rows yields NULL")
  }

}
