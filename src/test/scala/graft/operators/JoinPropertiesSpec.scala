package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Differential property tests: the bucketed range join and the merge
  * as-of join against brute-force models on randomized data, including
  * pre-1970 timestamps, bucket-boundary values, and (key, time) ties.
  */
class JoinPropertiesSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val rnd = new scala.util.Random(17)
  // Epoch seconds straddling 0 and window boundaries (window = 60s).
  private def randTs(): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(601) - 300L))

  test("rangeJoin equals the naive inequality join on 200x300 random rows") {
    import spark.implicits._
    val left = (1 to 200).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", randTs())).toSeq
    val right = (1 to 300).map(i =>
      (i.toLong + 1000, s"u${rnd.nextInt(5)}", randTs())).toSeq
    val w = 60L
    val got = RangeJoin.rangeJoin(
        left.toDF("l_id", "k", "lt"), right.toDF("r_id", "k", "rt"),
        Seq("k"), "lt", "rt", w)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (lid, lk, lt) <- left
      (rid, rk, rt) <- right
      if lk == rk
      if rt.getTime >= lt.getTime && rt.getTime < lt.getTime + w * 1000
    } yield (lid, rid)).toSet
    assert(got === want)
  }

  test("asofBackward equals the naive per-row argmax on random rows with ties") {
    import spark.implicits._
    // Coarse time grid forces (key, time) ties; tiebreak = r_id.
    def gridTs(): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond((rnd.nextInt(21) - 10) * 30L))
    val left = (1 to 150).map(i => (i.toLong, s"u${rnd.nextInt(4)}", gridTs()))
    val right = (1 to 200).map(i => (i.toLong + 500, s"u${rnd.nextInt(4)}", gridTs()))
    val got = AsOfJoin.asofBackward(
        left.toDF("l_id", "k", "lt"), right.toDF("r_id", "k", "rt"),
        Seq("k"), "lt", "rt", Seq("r_id"), rightTiebreak = Some("r_id"))
      .select("l_id", "asof_r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    left.foreach { case (lid, lk, lt) =>
      val cands = right.filter { case (_, rk, rt) =>
        rk == lk && !rt.after(lt) }
      val want =
        if (cands.isEmpty) None
        else Some(cands.maxBy { case (rid, _, rt) => (rt.getTime, rid) }._1)
      assert(got(lid) === want, s"left $lid key $lk t=$lt")
    }
  }

  test("asofForward equals the naive per-row argmin on random rows with ties") {
    import spark.implicits._
    def gridTs(): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond((rnd.nextInt(21) - 10) * 30L))
    val left = (1 to 150).map(i => (i.toLong, s"u${rnd.nextInt(4)}", gridTs()))
    val right = (1 to 200).map(i => (i.toLong + 500, s"u${rnd.nextInt(4)}", gridTs()))
    val got = AsOfJoin.asofForward(
        left.toDF("l_id", "k", "lt"), right.toDF("r_id", "k", "rt"),
        Seq("k"), "lt", "rt", Seq("r_id"), rightTiebreak = Some("r_id"))
      .select("l_id", "asof_r_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    left.foreach { case (lid, lk, lt) =>
      val cands = right.filter { case (_, rk, rt) =>
        rk == lk && !rt.before(lt) }
      val want =
        if (cands.isEmpty) None
        // earliest time; at ties the LOWEST id — the forward contract
        else Some(cands.minBy { case (rid, _, rt) => (rt.getTime, rid) }._1)
      assert(got(lid) === want, s"left $lid key $lk t=$lt")
    }
  }

  test("asofNearest picks the closer side, backward on exact ties") {
    import spark.implicits._
    def gridTs(): Timestamp =
      Timestamp.from(java.time.Instant.ofEpochSecond((rnd.nextInt(21) - 10) * 30L))
    val left = (1 to 150).map(i => (i.toLong, s"u${rnd.nextInt(4)}", gridTs()))
    val right = (1 to 200).map(i => (i.toLong + 500, s"u${rnd.nextInt(4)}", gridTs()))
    val got = AsOfJoin.asofNearest(
        left.toDF("l_id", "k", "lt"), right.toDF("r_id", "k", "rt"),
        Seq("k"), "lt", "rt", Seq("r_id"), rightTiebreak = Some("r_id"))
      .select("l_id", "asof_r_id", "asof_dir").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getString(2)))
      .toMap
    left.foreach { case (lid, lk, lt) =>
      val back = right.filter { case (_, rk, rt) => rk == lk && !rt.after(lt) }
      val fwd = right.filter { case (_, rk, rt) => rk == lk && !rt.before(lt) }
      val b = if (back.isEmpty) None
        else Some(back.maxBy { case (rid, _, rt) => (rt.getTime, rid) })
      val f = if (fwd.isEmpty) None
        else Some(fwd.minBy { case (rid, _, rt) => (rt.getTime, rid) })
      val want: (Option[Long], String) = (b, f) match {
        case (None, None) => (None, "none")
        case (Some(bb), None) => (Some(bb._1), "backward")
        case (None, Some(ff)) => (Some(ff._1), "forward")
        case (Some(bb), Some(ff)) =>
          val db = lt.getTime - bb._3.getTime
          val df = ff._3.getTime - lt.getTime
          if (db <= df) (Some(bb._1), "backward") else (Some(ff._1), "forward")
      }
      assert(got(lid) === want, s"left $lid key $lk t=$lt")
    }
  }
}
