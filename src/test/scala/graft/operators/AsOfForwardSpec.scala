package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics pins for the forward and nearest as-of variants on a
  * hand-built frame covering: inclusive equal-time match, tie-break
  * direction (forward lowest-wins vs backward highest-wins), nearest
  * preferring backward on exact tie, and the no-match row.
  */
class AsOfForwardSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  private lazy val left = Seq(
    (1L, 10L, ts(100)), // right rows at 100 (tie) and 150
    (2L, 10L, ts(130)), // backward 100(s), forward 150
    (3L, 20L, ts(50)),  // key with no right rows at all
    (4L, 30L, ts(75))   // equidistant: 70 back, 80 forward → backward
  ).toDF("event_id", "user_id", "ts")

  private lazy val right = Seq(
    (901L, 10L, ts(100)),
    (902L, 10L, ts(100)), // same instant as 901 — tiebreak target
    (903L, 10L, ts(150)),
    (904L, 30L, ts(70)),
    (905L, 30L, ts(80))
  ).toDF("click_id", "user_id", "ts")

  test("asofForward: inclusive >=, lowest tiebreak wins, null when none") {
    val out = AsOfJoin.asofForward(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), rightTiebreak = Some("click_id"))
      .orderBy("event_id")
      .select("event_id", "asof_click_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // row 1: clicks at exactly t=100 are eligible; LOWEST id (901) wins
    // row 2: next click after 130 is 903; row 3: none; row 4: 905 at 80
    assert(out.toSeq == Seq((1L, 901L), (2L, 903L), (3L, -1L), (4L, 905L)))
  }

  test("asofBackward keeps highest-wins at ties (mirror contract)") {
    val out = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), rightTiebreak = Some("click_id"))
      .orderBy("event_id")
      .select("event_id", "asof_click_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq == Seq((1L, 902L), (2L, 902L), (3L, -1L), (4L, 904L)))
  }

  test("asofNearest: distance picks the side, backward wins exact ties") {
    val out = AsOfJoin.asofNearest(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), rightTiebreak = Some("click_id"))
      .orderBy("event_id")
      .select("event_id", "asof_click_id", "asof_dir")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 902L, "backward"), // dist 0 both ways → backward, highest id
      (2L, 903L, "forward"),  // 30s back vs 20s forward
      (3L, -1L, "none"),
      (4L, 904L, "backward")  // 5s either way → backward preferred
    ))
  }
}
