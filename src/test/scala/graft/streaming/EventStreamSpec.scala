package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

final case class Doc(doc_id: Long, ts: Timestamp, text: String)

final case class Chg(id: Long, name: String, score: Double, seq: Long)

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 00:45:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0),
    Ev(4, ts("2024-01-01 02:00:00"), 2, "click", 4.0),
    Ev(5, ts("2024-01-01 02:20:00"), 2, "click", 5.0),
  )

  test("streaming hourly agg equals batch hourly agg on the same data") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    input.addData(batch: _*)
    val q = EventStream.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("hourly")
      .orderBy("hour_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val batchRes = EventStream.hourlyAgg(batch.toDF())
      .orderBy("hour_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed === batchRes)
    assert(streamed.map(_._3).sum === 5)
  }

  test("streaming bounded top-k (TopKAgg state) equals the batch answer") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    input.addData(batch.take(2): _*)
    val q = EventStream.hourlyTopK(input.toDF(), k = 2)
      .writeStream.format("memory").queryName("topk")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      input.addData(batch.drop(2): _*) // second micro-batch: state merges
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("topk")
      .orderBy("hour_start", "rank")
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val batchRes = EventStream.hourlyTopK(batch.toDF(), k = 2)
      .orderBy("hour_start", "rank")
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(streamed.nonEmpty)
    assert(streamed === batchRes)
    // Hour 02 holds events 4 (v=4) and 5 (v=5): rank 1 must be event 5.
    val h2 = streamed.filter(_._1 == ts("2024-01-01 02:00:00"))
    assert(h2.map(t => (t._2, t._3)).toSeq === Seq((1, 5L), (2, 4L)))
  }

  test("session_window splits on >30min gaps per user") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    input.addData(batch: _*)
    val q = EventStream.sessionAgg(input.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()

    val rows = spark.table("sessions")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // user 1: 00:05 and 00:45 are 40min apart → two sessions, 01:10 is 25min
    // after 00:45 → joins the second session; user 2: one session of 2.
    assert(rows === Seq((1L, 1L), (1L, 2L), (2L, 2L)))
  }

  test("flatMapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    val input = MemoryStream[UserEvent](spark)
    val q = EventStream.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(1, ts("2024-01-01 00:00:00"), 7, 1.5),
        UserEvent(2, ts("2024-01-01 00:01:00"), 7, 2.5))
      q.processAllAvailable()
      input.addData(UserEvent(3, ts("2024-01-01 00:02:00"), 7, 4.0),
        UserEvent(4, ts("2024-01-01 00:03:00"), 9, 10.0))
      q.processAllAvailable()

      val rows = spark.table("running")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
      // user 7: batch 1 state (2 events, 4.0), then batch 2 state carries on
      // (3 events, 8.0, 2 batches); user 9 appears only in batch 2.
      assert(rows === Set((7L, 2L, 4.0, 1), (7L, 3L, 8.0, 2), (9L, 1L, 10.0, 1)))
    } finally q.stop()
  }

  test("transformWithState replay filter: only ids above the prior " +
    "batch watermark pass; state survives batches") {
    import spark.implicits._
    // transformWithState requires the RocksDB state store provider;
    // scope the conf to this query and restore after
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserEvent](spark)
      val q = EventStream.replayFiltered(input.toDS())
        .writeStream.format("memory").queryName("replay_filtered")
        .outputMode("append").start()
      try {
        input.addData(
          UserEvent(5, ts("2024-01-01 00:00:00"), 7, 1.0),
          UserEvent(3, ts("2024-01-01 00:01:00"), 7, 2.0), // same batch: passes (vs PRIOR watermark)
          UserEvent(4, ts("2024-01-01 00:02:00"), 9, 3.0))
        q.processAllAvailable()
        input.addData(
          UserEvent(5, ts("2024-01-01 00:03:00"), 7, 4.0),  // replay of id 5 → dropped
          UserEvent(2, ts("2024-01-01 00:04:00"), 7, 5.0),  // stale → dropped
          UserEvent(6, ts("2024-01-01 00:05:00"), 7, 6.0),  // fresh → passes
          UserEvent(4, ts("2024-01-01 00:06:00"), 9, 7.0))  // replay for user 9 → dropped
        q.processAllAvailable()
        val rows = spark.table("replay_filtered")
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        assert(rows === Set((5L, 7L), (3L, 7L), (4L, 9L), (6L, 7L)),
          s"unexpected surviving events: $rows")
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }

  test("streaming dedup drops replayed event_ids within the watermark") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    val q = EventStream.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      input.addData(batch.take(3): _*) // replay
      q.processAllAvailable()
      assert(spark.table("dedup").count() === batch.size)
    } finally q.stop()
  }

  test("stream-static join enriches events with the users dimension") {
    import spark.implicits._
    val users = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev](spark)
    val q = EventStream.enrichWithUsers(input.toDF(), users)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:06:00"), 2, "view", 2.0),
        Ev(3, ts("2024-01-01 00:07:00"), 9, "click", 3.0)) // no dim row
      q.processAllAvailable()
      val got = spark.table("enriched")
        .select("event_id", "tier")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
    } finally q.stop()
  }

  test("streaming signature dedup drops same-simhash re-posts, keeps distinct docs") {
    import spark.implicits._
    val input = MemoryStream[Doc](spark)
    val q = EventStream.dedupDocsBySignature(input.toDF())
      .writeStream.format("memory").queryName("sig_dedup")
      .outputMode("append").start()
    try {
      val a = "the quick brown fox jumps over the lazy dog again and again"
      val b = "completely different content about spark engines and shuffles"
      input.addData(
        Doc(1, ts("2024-01-01 00:00:00"), a),
        Doc(2, ts("2024-01-01 00:10:00"), b))
      q.processAllAvailable()
      // Exact re-post of a (new doc_id, later ts) → same signature → dropped.
      input.addData(Doc(3, ts("2024-01-01 00:20:00"), a))
      // Sub-shingle docs have NULL signatures: two DISTINCT short docs
      // must both survive (exact-content fallback key), while an exact
      // short re-post is still dropped.
      input.addData(
        Doc(4, ts("2024-01-01 00:25:00"), "hello world"),
        Doc(5, ts("2024-01-01 00:30:00"), "goodbye moon"),
        Doc(6, ts("2024-01-01 00:35:00"), "hello world"))
      q.processAllAvailable()
      val kept = spark.table("sig_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L, 5L))
    } finally q.stop()
  }

  test("streaming contamination flags docs sharing a 5-gram with the bench set") {
    import spark.implicits._
    val input = MemoryStream[Doc](spark)
    val benchDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq(benchDoc).toDF("text")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.ShinglesOf(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " "), 5)).as("ngram"))
      .distinct()
    val q = EventStream.flagContaminated(input.toDF(), bench)
      .writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    try {
      input.addData(
        // contains "beta gamma delta epsilon zeta" → contaminated
        Doc(1, ts("2024-01-01 00:05:00"),
          "prefix beta gamma delta epsilon zeta suffix"),
        // same vocabulary, different order → no shared 5-gram
        Doc(2, ts("2024-01-01 00:10:00"),
          "zeta epsilon delta gamma beta alpha theta eta"),
        Doc(3, ts("2024-01-01 00:15:00"),
          "completely unrelated words about spark shuffles"))
      q.processAllAvailable()
      // Advance the watermark past the window so append mode emits.
      input.addData(Doc(9, ts("2024-01-01 03:00:00"), "late watermark mover"))
      q.processAllAvailable()
      val flagged = spark.table("contam")
        .select("doc_id", "n_hits").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged.keySet === Set(1L))
      assert(flagged(1L) >= 1L)
    } finally q.stop()
  }

  test("streaming quality filter applies the batch t13 rules statelessly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val input = MemoryStream[Doc](spark)
    val q = EventStream.annotateDocQuality(input.toDF())
      .writeStream.format("memory").queryName("doc_quality")
      .outputMode("append").start()
    try {
      val short = "way too short"
      val good = (1 to 30).map(i => s"tok$i").mkString(" ") +
        " the a the a " + (31 to 50).map(i => s"tok$i").mkString(" ")
      val repetitive = ("dup " * 60).trim
      input.addData(
        Doc(1, ts("2024-01-01 00:00:00"), short),
        Doc(2, ts("2024-01-01 00:01:00"), good),
        Doc(3, ts("2024-01-01 00:02:00"), repetitive))
      q.processAllAvailable()
      val got = spark.table("doc_quality")
        .select("doc_id", "drop_reason", "keep").collect()
        .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getBoolean(2))))
        .toMap
      assert(got(1L) == ((Some("too_short"), false)))
      assert(got(2L) == ((None, true)))
      assert(got(3L) == ((Some("low_diversity"), false)))
      // differential: streaming verdicts equal the batch rule on the
      // same texts
      val batch = Seq((1L, short), (2L, good), (3L, repetitive))
        .toDF("doc_id", "text")
      val (_, _, _, reason) =
        graft.queries.TextOps3.qualityFeatures(col("text"))
      val want = batch.select(col("doc_id"), reason.as("r"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.view.mapValues(_._1).toMap == want)
    } finally q.stop()
  }

  test("streaming CMS cells equal the batch sketch on the same tokens") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, split, count, lit}
    val input = MemoryStream[Doc](spark)
    val q = EventStream.cmsTokenCells(input.toDF())
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("append").start()
    try {
      val texts = Seq(
        "spark shuffles spark joins spark scans",
        "joins and scans and shuffles",
        "spark spark spark")
      input.addData(texts.zipWithIndex.map { case (t, i) =>
        Doc(i.toLong, ts(f"2024-01-01 00:${i * 5}%02d:00"), t)
      }: _*)
      q.processAllAvailable()
      // advance watermark past the hour so append emits the window
      input.addData(Doc(9, ts("2024-01-01 03:00:00"), "mover"))
      q.processAllAvailable()
      val got = spark.table("cms_cells")
        .filter(col("window_start") === ts("2024-01-01 00:00:00"))
        .collect()
        .map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
      val want = texts.toDF("text")
        .select(explode(split(col("text"), " ")).as("token"))
        .select(explode(
          graft.queries.TextOps2.cmsBuckets(col("token"), 4, 256)).as("rb"))
        .groupBy("rb.row_j", "rb.bucket").agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, "streaming cells diverge from the batch sketch")
      // CMS guarantee on the streamed cells: estimate >= exact count
      val sparkTokenCells = Seq("spark").toDF("token")
        .select(explode(
          graft.queries.TextOps2.cmsBuckets(col("token"), 4, 256)).as("rb"))
        .collect().map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getLong(1)))
      val est = sparkTokenCells.map(got).min
      assert(est >= 6, s"cms estimate $est undercounts 'spark' (6 occurrences)")
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    import spark.implicits._
    val purchases = MemoryStream[Ev](spark)
    val clicks = MemoryStream[Ev](spark)
    val q = EventStream.purchaseClickJoin(purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(
        Ev(10, ts("2024-01-01 01:00:00"), 1, "click", 0),
        Ev(11, ts("2024-01-01 02:30:00"), 1, "click", 0),
        Ev(12, ts("2024-01-01 01:00:00"), 2, "click", 0))
      purchases.addData(
        Ev(1, ts("2024-01-01 01:30:00"), 1, "purchase", 0), // ← click 10
        Ev(2, ts("2024-01-01 03:00:00"), 1, "purchase", 0), // ← click 11
        Ev(3, ts("2024-01-01 05:00:00"), 2, "purchase", 0)) // none in range
      q.processAllAvailable()
      val pairs = spark.table("ss_join")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from finalized windows") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    // append mode: a window only emits once the watermark passes its end,
    // and late rows for finalized windows must not resurrect them.
    val q = EventStream.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("late_hourly")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time far enough that watermark (1h) passes hour 0
      input.addData(Ev(3, ts("2024-01-01 03:30:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val afterFinalize = spark.table("late_hourly")
        .filter(col("hour_start") === ts("2024-01-01 00:00:00"))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      assert(afterFinalize === Set(("click", 2L))) // hour 0 finalized at n=2
      // a straggler into the finalized hour: must be ignored
      input.addData(Ev(4, ts("2024-01-01 00:30:00"), 1, "click", 99.0))
      q.processAllAvailable()
      val afterLate = spark.table("late_hourly")
        .filter(col("hour_start") === ts("2024-01-01 00:00:00"))
        .collect().map(r => (r.getString(1), r.getLong(2))).toSet
      assert(afterLate === afterFinalize,
        "late event past the watermark changed a finalized window")
    } finally q.stop()
  }

  test("foreachBatch IVM summary is independent of micro-batch boundaries") {
    import spark.implicits._
    val input = MemoryStream[Ev](spark)
    var images = List.empty[Map[String, (Long, BigDecimal)]]
    val q = EventStream.incrementalSummary(input.toDF())(s => images ::= s)
    try {
      input.addData(batch.take(2): _*)
      q.processAllAvailable()
      input.addData(batch.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val merged = images.head
    // direct recompute over ALL events in one batch — the IVM law says
    // the two-batch merge must land on the same states
    val direct = EventStream
      .summarizeBatch(batch.toDF())
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2))))
      .toMap
    assert(merged === direct, "incremental merge diverged from recompute")
    assert(images.length >= 2, "onUpdate not called per micro-batch")
  }

  test("left-outer interval join emits unmatched purchases after the watermark closes") {
    import spark.implicits._
    val purchases = MemoryStream[Ev](spark)
    val clicks = MemoryStream[Ev](spark)
    val q = EventStream.purchaseClickLeftJoin(
        purchases.toDF(), clicks.toDF())
      .writeStream.format("memory").queryName("louter")
      .outputMode("append").start()
    try {
      // user 1: click then purchase (matched); user 2: purchase, no click
      clicks.addData(Ev(10, ts("2024-01-01 00:30:00"), 1, "click", 1.0))
      purchases.addData(
        Ev(11, ts("2024-01-01 01:00:00"), 1, "purchase", 9.0),
        Ev(12, ts("2024-01-01 01:00:00"), 2, "purchase", 8.0))
      q.processAllAvailable()
      // advance BOTH watermarks far past the interval end so the
      // unmatched purchase is provably closed and the outer row emits
      clicks.addData(Ev(13, ts("2024-01-01 09:00:00"), 3, "click", 1.0))
      purchases.addData(Ev(14, ts("2024-01-01 09:00:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData(Ev(15, ts("2024-01-01 12:00:00"), 3, "click", 1.0))
      purchases.addData(Ev(16, ts("2024-01-01 12:00:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("louter").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(rows.contains((11L, 10L)), "matched purchase must join its click")
    assert(rows.contains((12L, -1L)),
      s"unmatched purchase must emit with null click, got $rows")
  }

  test("event-time-timeout sessions close exactly once after the idle gap") {
    import spark.implicits._
    val input = MemoryStream[UserEvent](spark)
    val q = EventStream.idleClosedSessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("idle_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        UserEvent(1, ts("2024-01-01 00:00:00"), 7, 1.0),
        UserEvent(2, ts("2024-01-01 00:10:00"), 7, 1.0))
      q.processAllAvailable()
      assert(spark.table("idle_sessions").isEmpty,
        "session must stay open before the gap elapses")
      // watermark jumps past 00:10 + 30min → user 7's session closes
      input.addData(UserEvent(3, ts("2024-01-01 02:00:00"), 8, 1.0))
      q.processAllAvailable()
      input.addData(UserEvent(4, ts("2024-01-01 05:00:00"), 9, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("idle_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getTimestamp(3)))
    val u7 = rows.filter(_._1 == 7L)
    assert(u7.length == 1, s"exactly one closed session for user 7: $rows")
    assert(u7.head._2 == 2L)
    assert(u7.head._3 == ts("2024-01-01 00:00:00"))
    assert(u7.head._4 == ts("2024-01-01 00:10:00"))
  }

  test("cdc upsert: foreachBatch merge materializes latest state, one " +
      "snapshot per batch, last change per key wins") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fwcdc")
      .toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("fwcdcck").toString
    val sc4 = "id:long:6,name:string:6,score:double:8"
    val schema = graft.sources.FixedWidth.parseSchema(sc4)
    def state(): Seq[(Long, String, Double)] = spark.read
      .format("graft.sources.FixedWidth").option("schema", sc4)
      .load(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

    val input = MemoryStream[Chg](spark)
    val q = EventStream.cdcUpsert(input.toDF(), dir, schema, "id", "seq",
      ckpt)
    try {
      // batch 1: two inserts; id 2 changes twice — seq 3 must win
      input.addData(Chg(1, "a", 1.0, 1), Chg(2, "b", 2.0, 2),
        Chg(2, "b2", 2.5, 3))
      q.processAllAvailable()
      assert(state() === Seq((1L, "a", 1.0), (2L, "b2", 2.5)))
      // batch 2: update id 1, insert id 3
      input.addData(Chg(1, "a2", -1.0, 4), Chg(3, "c", 3.0, 5))
      q.processAllAvailable()
      assert(state() === Seq((1L, "a2", -1.0), (2L, "b2", 2.5),
        (3L, "c", 3.0)))
    } finally q.stop()
    // each non-empty batch committed exactly one snapshot version
    val versions = spark.read.format("graft.sources.FixedWidth")
      .option("history", "true").option("schema", sc4).load(dir)
      .orderBy("version").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(versions.toSeq === Seq((1L, 2L), (2L, 3L)))
    // replaying the last batch's rows leaves the state unchanged
    // (at-least-once delivery => exactly-once table state)
    graft.sources.FwMaintenance.merge(spark, dir, schema,
      Seq((1L, "a2", -1.0), (3L, "c", 3.0)).toDF("id", "name", "score"),
      "id")
    assert(state() === Seq((1L, "a2", -1.0), (2L, "b2", 2.5),
      (3L, "c", 3.0)))
  }

  test("file-based streaming read of the harness events table works end-to-end") {
    val dir = "/root/testdata/sf0.001"
    val q = EventStream.hourlyAgg(EventStream.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    val n = spark.table("file_hourly").agg(sum("n")).collect()(0).getLong(0)
    assert(n === 1000) // all sf0.001 events accounted for
    // unit regression guard: a mis-scaled epoch lands windows in 1970
    val years = spark.table("file_hourly")
      .select(year(col("hour_start"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(years.forall(_ >= 2020), s"hour windows in wrong era: $years")
  }
}
