package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape — the
  * streaming analogue of the batch event queries (q11/q13). The reference is
  * strictly batch (SURVEY.md §2.2), so this is north-star extension surface:
  * `readStream` → watermark → windowed/session aggregation, designed so the
  * same transform functions serve both batch DataFrames and streams
  * (unifying the two is the idiomatic Spark pattern).
  */
final case class UserEvent(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, value: Double)

final case class UserRunningTotal(user_id: Long, total_events: Long,
    total_value: Double, batches_seen: Int)

object EventStream {

  /** Raw file schema with `tsType` as the physical type of `ts` — the
    * testdata generator has emitted TIMESTAMP(NANOS) (readable only as
    * nanos-since-epoch long under the legacy conf), plain
    * TIMESTAMP(MICROS) (TIMESTAMP_NTZ), and zoned TIMESTAMP across
    * generations; see Tables.events.
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** Streaming read of event parquet files landing in `dir`, normalized
    * to zoned microsecond TimestampType `ts` for every testdata
    * generation. Streaming sources need a declared schema, so the actual
    * ts physical type is sniffed ONCE from the files already present via
    * a batch read — a driver-side, metadata-only probe.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read
      .option("pathGlobFilter", "events*.parquet").parquet(dir)
      .schema("ts").dataType
    val raw = spark.readStream
      .schema(rawSchema(tsType))
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
    tsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Tumbling 1-hour counts + sums per event type; 1-hour watermark bounds
    * state and drops late data. Works on both batch and streaming frames
    * (watermark is a no-op in batch).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 6).cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming bounded top-k: per tumbling hour, the 3 highest-value
    * events via the custom [[graft.functions.TopKAgg]] — the
    * TypedImperativeAggregate's serialize/deserialize is exactly what
    * the state store persists between micro-batches, so the same
    * bounded-memory aggregate that replaces window+filter top-k in
    * batch ALSO maintains streaming per-window top-k with k-bounded
    * state. Works identically on batch frames (watermark no-op).
    */
  def hourlyTopK(events: DataFrame, k: Int = 3): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopKAgg(
        struct(round(col("value"), 6).as("v"), col("event_id")), k)
        .as("top"))
      .select(col("window.start").as("hour_start"),
        posexplode(col("top")).as(Seq("r", "t")))
      .select(col("hour_start"), (col("r") + 1).as("rank"),
        col("t")("event_id").as("event_id"), col("t")("v").as("value"))

  /** Running per-user counters with custom state (flatMapGroupsWithState):
    * emits an updated (user_id, total_events, total_value, batches_seen)
    * row per user per trigger. The state survives across micro-batches —
    * the arbitrary-state tier below windowed/session aggregation, for
    * logic the built-in aggregates can't express (here: batch arrival
    * counting; in production: ML feature decay, CDC upserts, rule engines).
    */
  def runningUserTotals(events: Dataset[UserEvent])
      : Dataset[UserRunningTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunningTotal, UserRunningTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[UserEvent],
            state: GroupState[UserRunningTotal]) =>
          val evs = batch.toSeq
          val prev = state.getOption
            .getOrElse(UserRunningTotal(userId, 0L, 0.0, 0))
          val next = UserRunningTotal(
            userId,
            prev.total_events + evs.size,
            prev.total_value + evs.map(_.value).sum,
            prev.batches_seen + 1)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks from the preceding hour. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can prove when
    * buffered state is safe to evict — the stateful join pattern that
    * stays bounded on an infinite stream.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** LEFT OUTER stream-stream interval join: like [[purchaseClickJoin]],
    * but purchases with NO preceding click still emit — with null click
    * columns — once the click-side watermark proves no match can arrive.
    * The outer row's emission is therefore watermark-driven (delayed
    * until the interval is provably closed), which is the semantics
    * attribution pipelines rely on to count organic conversions.
    */
  def purchaseClickLeftJoin(purchases: DataFrame,
      clicks: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val c = clicks
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Final state of an idle-closed session. */
  final case class SessionSummary(user_id: Long, n_events: Long,
      first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

  /** Idle-session closer with EVENT-TIME timeout state: a user's session
    * accumulates silently in state; nothing is emitted until the event-
    * time watermark passes last_ts + gap, at which point the closed
    * session summary emits exactly once and the state is freed. This is
    * the flatMapGroupsWithState + EventTimeTimeout pattern — the general
    * escape hatch when session_window's built-in semantics (per-window
    * aggregates only) aren't enough.
    */
  def idleClosedSessions(events: Dataset[UserEvent],
      gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[UserEvent],
            state: GroupState[SessionSummary]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            val evs = batch.toSeq
            val prev = state.getOption
            val first = prev.map(_.first_ts)
              .getOrElse(evs.map(_.ts).min(Ordering.by((t: java.sql.Timestamp) => t.getTime)))
            val last = (prev.map(_.last_ts).toSeq ++ evs.map(_.ts))
              .max(Ordering.by((t: java.sql.Timestamp) => t.getTime))
            val next = SessionSummary(userId,
              prev.map(_.n_events).getOrElse(0L) + evs.size, first, last)
            state.update(next)
            state.setTimeoutTimestamp(last.getTime + gapMinutes * 60000L)
            Iterator.empty
          }
      }
  }

  /** Streaming exact dedup on event_id within the watermark horizon —
    * dropDuplicatesWithinWatermark is the variant whose seen-id state is
    * actually purged as the watermark advances (plain dropDuplicates with
    * only non-event-time keys grows state forever); the standard
    * at-least-once → effectively-once repair step.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: every streaming event joins its user's
    * row from a STATIC dimension frame — stateless (unlike the
    * stream-stream interval join, nothing is buffered; the static side
    * is re-planned per micro-batch and broadcast at dimension sizes).
    * The standard shape for decorating an event stream with slowly
    * changing reference data.
    */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(users, Seq("user_id"), "left")

  /** Streaming content dedup for a document stream: each doc folds to its
    * 64-bit simhash in one per-row pass (the ShinglesOf + SimHashOf
    * kernels are pure map expressions, so they compose with Structured
    * Streaming unchanged — no aggregation state for the signature), and
    * later docs with the SAME signature inside the watermark horizon are
    * dropped. Catches exact re-posts and edits small enough to leave the
    * vote signs unchanged; full Hamming-distance near-dup stays a batch
    * concern (SimHash.nearDuplicates) — any-chunk matching would need
    * per-bucket custom state. Seen-signature state is purged as the
    * watermark advances, like [[dedupEvents]].
    */
  def dedupDocsBySignature(docs: DataFrame, tsCol: String = "ts"): DataFrame =
    docs.withColumn("simhash",
        graft.functions.SimHashOf(
          graft.functions.ShinglesOf(split(col("text"), " "), 3),
          graft.functions.SketchOps.HashXx64))
      // Sub-shingle (< 3 words) and null-text docs have a NULL signature;
      // dropDuplicates groups NULL keys together, which would silently
      // collapse all such unrelated docs into one. They fall back to
      // exact-content dedup via the text hash instead.
      .withColumn("_dedup_key",
        coalesce(col("simhash"), xxhash64(coalesce(col("text"), lit("")))))
      .withWatermark(tsCol, "1 hour")
      .dropDuplicatesWithinWatermark("_dedup_key")
      .drop("_dedup_key")

  /** Streaming benchmark decontamination: flag each arriving document
    * that shares a 5-gram shingle with the (static, small) benchmark
    * n-gram set — the streaming counterpart of batch d9_contamination.
    *
    * Shape: the per-row shingle kernel and the stream-static inner join
    * are STATELESS (the benchmark frame broadcasts — eval suites are
    * small by construction); only the per-doc hit count holds state,
    * and that state is bounded by the event-time watermark (docs arrive
    * once, so each group closes when its hour window passes the
    * watermark and the row emits in append mode).
    *
    * @param benchNgrams static one-column frame `ngram` of distinct
    *                    benchmark shingles
    */
  def flagContaminated(docs: DataFrame, benchNgrams: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        explode(graft.functions.ShinglesOf(split(col("text"), " "), 5))
          .as("ngram"))
      .join(broadcast(benchNgrams.select("ngram")), Seq("ngram"))
      .groupBy(window(col("ts"), "1 hour"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col("doc_id"), col("window.start").as("window_start"),
        col("n_hits"))

  /** Streaming document quality filtering: EXACTLY the batch t13 rule
    * set ([[graft.queries.TextOps3.qualityFeatures]] — one definition,
    * two execution modes), annotated per arriving doc. Entirely
    * STATELESS (row-local Column expressions, no watermark, no state
    * store): the streaming plan is the batch plan under a different
    * source, which is the whole point of building filters as
    * expressions rather than per-mode code.
    */
  def annotateDocQuality(docs: DataFrame): DataFrame = {
    val (nTok, ttr, swRatio, reason) =
      graft.queries.TextOps3.qualityFeatures(col("text"))
    docs.select(col("doc_id"), col("ts"), nTok.as("n_tok"),
      round(ttr, 6).as("ttr"), round(swRatio, 6).as("sw_ratio"),
      reason.as("drop_reason"), reason.isNull.as("keep"))
  }

  /** Streaming count-min sketch maintenance: per hour window, the same
    * depth-4 × width-256 cells as the batch sketch (q56 — the builder is
    * shared, [[graft.queries.TextOps2.cmsBuckets]]), counted under the
    * event-time watermark. The sketch stays 1024 cells per window no
    * matter the token volume — the whole point of CMS — and because the
    * cells are IDENTICAL to the batch layout, windowed streaming cells
    * merge with historical batch cells by plain addition (mergeability
    * is what makes the sketch a streaming structure at all).
    */
  def cmsTokenCells(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", "1 hour")
      .select(col("ts"), explode(split(col("text"), " ")).as("token"))
      .select(col("ts"),
        explode(graft.queries.TextOps2.cmsBuckets(col("token"), 4, 256))
          .as("rb"))
      .groupBy(window(col("ts"), "1 hour"),
        col("rb.row_j").as("row_j"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("window_start"),
        col("row_j"), col("bucket"), col("c"))

  /** One micro-batch's partial summary states per event_type — count plus
    * an order-free DECIMAL sum, the mergeable half of the incremental-
    * view-maintenance law (the streaming counterpart of batch q106).
    */
  def summarizeBatch(batch: DataFrame): DataFrame =
    batch.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 2).cast("decimal(18,2)")).as("s"))

  /** Merge a batch's partials into the running summary by partial-state
    * addition. Associative and commutative (counts/sums add, DECIMAL is
    * order-free), so the summary is independent of how the stream was cut
    * into micro-batches — pinned in EventStreamSpec against a direct
    * batch recompute. At scale this map lives in a keyed sink (an upsert
    * target); per-type partials are bounded by the type cardinality.
    */
  def mergeSummary(acc: Map[String, (Long, BigDecimal)],
      partials: Array[org.apache.spark.sql.Row])
      : Map[String, (Long, BigDecimal)] =
    partials.foldLeft(acc) { (m, r) =>
      val k = r.getString(0)
      val (n0, s0) = m.getOrElse(k, (0L, BigDecimal(0)))
      m.updated(k, (n0 + r.getLong(1), s0 + BigDecimal(r.getDecimal(2))))
    }

  /** foreachBatch IVM driver: each micro-batch is folded to its bounded
    * per-type partials (distributed aggregation), then merged into the
    * running summary on the sink side; `onUpdate` sees every new summary
    * image.
    */
  def incrementalSummary(events: DataFrame)(
      onUpdate: Map[String, (Long, BigDecimal)] => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var summary = Map.empty[String, (Long, BigDecimal)]
    events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        summary = mergeSummary(summary, summarizeBatch(batch).collect())
        onUpdate(summary)
      }
      .start()
  }

  /** Streaming CDC upsert into a fixed-width table: each micro-batch's
    * change rows collapse to the LAST change per key (by `seqCol` —
    * within one batch only the final image matters), then apply as ONE
    * copy-on-write [[graft.sources.FwMaintenance.merge]], so the table
    * is always the latest state and every batch is a snapshot version —
    * the streaming-materialized-view pattern Delta calls `foreachBatch
    * + MERGE`. Crash-replay safe without a transaction log: re-applying
    * a batch re-updates the same keys to the same images (updates are
    * idempotent; re-inserted keys match their previous insert and
    * update in place), so at-least-once batch delivery yields
    * exactly-once table STATE. Scale shape inherits merge's: per batch,
    * only key-envelope-touched files rewrite, the delta broadcasts.
    */
  def cdcUpsert(changes: DataFrame, tablePath: String,
      schema: org.apache.spark.sql.types.StructType, keyCol: String,
      seqCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCol).orderBy(col(seqCol).desc)
          val latest = batch
            .withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1)
            .select(schema.fieldNames.map(col).toSeq: _*)
          graft.sources.FwMaintenance.merge(batch.sparkSession,
            tablePath, schema, latest, keyCol)
          ()
        }
      }
      .start()

  /** Gap-based sessionization with Spark's native session_window — state is
    * per (user, open session), closed by the 30-min gap + watermark.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Per-user replay suppression on the Spark-4 `transformWithState`
    * API (the successor to flatMapGroupsWithState: typed ValueState
    * handles, optional TTL, timers; requires the RocksDB state store).
    * Semantics: a batch's events pass only if their event_id exceeds
    * the user's high watermark from PRIOR batches — deterministic under
    * any intra-batch arrival order — then the watermark advances to the
    * batch max. The CDC/at-least-once-source pattern: replayed or
    * stale-duplicate events are dropped exactly once per key with O(1)
    * state per user.
    */
  class ReplayFilterProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, UserEvent] {
    @transient private var maxSeen:
        org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      maxSeen = getHandle.getValueState[Long]("maxEventId",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserEvent] = {
      val prior = if (maxSeen.exists()) maxSeen.get() else Long.MinValue
      val fresh = rows.filter(_.event_id > prior).toVector
      if (fresh.nonEmpty)
        maxSeen.update(math.max(prior, fresh.map(_.event_id).max))
      fresh.iterator
    }
  }

  def replayFiltered(events: Dataset[UserEvent]): Dataset[UserEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ReplayFilterProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
