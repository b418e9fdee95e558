package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("asofBackward: inclusive <=, deterministic ties, nulls when no match") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", ts(0)),  // before any click → null
      (2L, "u1", ts(3)),  // tie at t=3 → inclusive, highest tiebreak (11)
      (3L, "u1", ts(5)),  // latest click <= 5 is t=3 → 11
      (4L, "u1", ts(8)),  // latest click <= 8 is t=7 → 12
      (5L, "u2", ts(9)),  // user with no clicks at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (9L, "u1", ts(1)),
      (10L, "u1", ts(3)),
      (11L, "u1", ts(3)),
      (12L, "u1", ts(7)),
      (13L, "u2", null.asInstanceOf[Timestamp]), // null time: never a match
    ).toDF("click_id", "user_id", "ts")

    val out = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), rightTiebreak = Some("click_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))

    assert(out === Array(
      (1L, None), (2L, Some(11L)), (3L, Some(11L)), (4L, Some(12L)),
      (5L, None)))
  }

  test("asofBackward: sub-second timestamp tiebreaks order by unix_micros") {
    import spark.implicits._
    val left = Seq((1L, "u1", ts(5))).toDF("event_id", "user_id", "ts")
    // Two right rows tied at the same (key, time); the tiebreak column is a
    // timestamp whose values differ only below the second — cast("long")
    // would collide them, unix_micros must pick the later one (21).
    val right = Seq(
      (20L, "u1", ts(3), Timestamp.valueOf("2024-01-01 00:00:00.100")),
      (21L, "u1", ts(3), Timestamp.valueOf("2024-01-01 00:00:00.900")),
    ).toDF("click_id", "user_id", "ts", "seen_at")
    val out = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), rightTiebreak = Some("seen_at"))
      .select("asof_click_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(21L))
  }

  test("asofBackward rejects a non-integral, non-timestamp tiebreak") {
    import spark.implicits._
    val left = Seq((1L, "u1", ts(5))).toDF("event_id", "user_id", "ts")
    val right = Seq((20L, "u1", ts(3), 0.5))
      .toDF("click_id", "user_id", "ts", "w")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), rightTiebreak = Some("w"))
    }
    assert(e.getMessage.contains("integral/timestamp"))
  }

  test("rangeJoin: pre-1970 timestamps bucket by floor division") {
    import spark.implicits._
    // epoch -30s and +15s: double-div + cast truncation would put -30s in
    // bucket 0 (same as +15s) instead of bucket -1, and a boundary match
    // at exactly the window edge across buckets would be dropped.
    val left = Seq((1L, "u1", Timestamp.from(java.time.Instant.ofEpochSecond(-30L))))
      .toDF("p_id", "user_id", "p_ts")
    val right = Seq(
      (100L, "u1", Timestamp.from(java.time.Instant.ofEpochSecond(-30L))),
      (101L, "u1", Timestamp.from(java.time.Instant.ofEpochSecond(25L))),
      (102L, "u1", Timestamp.from(java.time.Instant.ofEpochSecond(30L))),
    ).toDF("c_id", "user_id", "c_ts")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"),
        "p_ts", "c_ts", windowSeconds = 60)
      .select("c_id").collect().map(_.getLong(0)).toSet
    // window [-30, 30): -30 and 25 match, 30 is the exclusive edge
    assert(out === Set(100L, 101L))
  }

  test("rangeJoin: inclusive start, exclusive end, cross-bucket matches") {
    import spark.implicits._
    def m(min: Int, sec: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    val left = Seq((1L, "u1", m(10)), (2L, "u1", m(50)), (3L, "u2", m(0)))
      .toDF("p_id", "user_id", "p_ts")
    val right = Seq(
      (100L, "u1", m(10)),     // equal ts → included (inclusive start)
      (101L, "u1", m(35)),     // in left@10's window, next 30-min bucket
      (102L, "u1", m(9, 59)),  // just before left@10 → excluded
      (104L, "u1", m(55)),     // in left@50's window only (55 >= 10+30)
      (103L, "u2", m(30)),     // exactly +window for left@0 → excluded
    ).toDF("c_id", "user_id", "c_ts")
    val out = RangeJoin.rangeJoin(left, right, Seq("user_id"),
        "p_ts", "c_ts", windowSeconds = 1800)
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 100L), (1L, 101L), (2L, 104L)))
  }
}
