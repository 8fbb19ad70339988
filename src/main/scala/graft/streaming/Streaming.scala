package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2 G4 + the streaming halves of
  * B1/B2: the reference declares source_type=stream + refresh=realtime,
  * /root/reference/src/registry/feature_registry.py:101,105, and a
  * ServingMode.STREAMING it never implements,
  * /root/reference/src/serving/feature_server.py:33-38 — this module is that
  * missing implementation, Spark-native).
  *
  * Everything is expressed over an unbounded DataFrame with event-time
  * watermarks; the same transformations compose on a batch frame (Spark's
  * unified model), which is how the batch oracle cross-checks them.
  */
object Streaming {

  /** One ingested feature observation (EAV row, §1.1 FeatureValue). */
  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

  /** Online-store state: latest value per (entity, feature) —
    * feature_server.py:428-438's dict, as managed stream state. Retains the
    * winning event_id so equal-timestamp ties replay the exact batch-side
    * rule (max event_id wins) across micro-batch boundaries. */
  case class LatestState(
      user_id: Long, event_type: String, value: Double,
      ts: java.sql.Timestamp, event_id: Long, version: Int)

  /** B1 streaming — validated append: the SAME Validation predicate as the
    * batch path (one definition — a rule added there applies here too),
    * applied to an unbounded stream. The declared watermark feeds any
    * DOWNSTREAM stateful operator; this filter itself is stateless, so
    * arbitrarily late rows still pass through it — Spark only drops late
    * data at stateful operators. A pipeline needing a hard late-data gate
    * composes this with a watermarked aggregate or dedup stage.
    */
  def validatedIngest(stream: DataFrame, activeTypes: Seq[String], watermark: String = "10 minutes"): DataFrame =
    graft.operators.Validation
      .withValidation(stream.withWatermark("ts", watermark), "event_type", "value", activeTypes)
      .where(col("is_valid")).drop("is_valid", "reject_reason")

  /** B1 streaming with reject routing: returns (valid, rejected) branches.
    * At scale a poison row must land in a reject sink with its reason, not
    * kill the stream — both branches are writeStream-able independently.
    */
  def validatedIngestRouted(
      stream: DataFrame,
      activeTypes: Seq[String],
      watermark: String = "10 minutes"): (DataFrame, DataFrame) = {
    val tagged = graft.operators.Validation
      .withValidation(stream.withWatermark("ts", watermark), "event_type", "value", activeTypes)
    (tagged.where(col("is_valid")).drop("is_valid", "reject_reason"),
      tagged.where(!col("is_valid")).drop("is_valid"))
  }

  /** EP1 streaming — online enrichment: a stream of entity requests joined
    * against the (static) online snapshot table. Stream-static joins need
    * no state; the snapshot is re-read per micro-batch, which is exactly
    * the freshness model of a serving tier backed by a MERGE-maintained
    * lakehouse table (feature_server.py:206-288's read path, distributed).
    */
  def enrichOnline(requests: DataFrame, snapshot: DataFrame, keyCols: Seq[String]): DataFrame =
    requests.join(snapshot, keyCols, "left")

  /** G4 — watermarked tumbling-window aggregate per feature. Sum rounding
    * uses the epsilon-before-round convention (graft.functions.Fns) so the
    * post-state can hash-match a batch-engine recompute. */
  def windowedCounts(stream: DataFrame, windowLen: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Fns.epsRound(sum("value"), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** G4 — event-time SESSION windows per entity: Spark's `session_window`
    * merges an event into the open session when it lands within `gap` of
    * the session's end, else opens a new one — gap-based sessionization as
    * a first-class streaming aggregate (state = one open session per
    * entity, evicted when the watermark passes session end + gap). Append
    * mode emits each session exactly once, when it can no longer grow —
    * the production shape for "sessions to a downstream table". NOTE on
    * oracles: the batch gap-sessionize (operators.Sessionize) is a sibling,
    * NOT an exact oracle — `session_window` reports session_end as
    * last-event + gap (Sessionize reports max(ts)) and breaks at gap ≥ the
    * threshold (windows merge only on STRICT overlap; Sessionize breaks at
    * gap > threshold). The declared-query oracle replays the
    * `session_window` semantics directly (SparkEntry g4_session_window).
    */
  def sessionWindows(
      stream: DataFrame,
      gap: String = "4 hours",
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), graft.functions.Fns.epsRound(sum("value"), 2).as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** G4 — exactly-once-ish ingest dedup: drop duplicate event_ids arriving
    * within the watermark horizon. */
  def dedupedStream(stream: DataFrame, watermark: String = "10 minutes"): DataFrame =
    stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Shared LWW state transition: pick the max-(ts, event_id) observation
    * among current state + batch (the exact batch-side tie rule), update
    * state, and return the new entry iff the key's latest actually changed.
    * Both keyed-state streams wrap this so the tie/dedupe/version logic
    * can't drift between them.
    */
  // full-precision event-time ordering: java.sql.Timestamp carries
  // sub-millisecond precision in its separate nanos field, and Spark
  // timestamps are microsecond-resolution — ordering by getTime alone
  // (milliseconds) truncates, so two events in the same millisecond would
  // fall through to the event_id tie-break and the stream could keep an
  // event the batch oracle (full TimestampType ordering) rejects.
  // (getTime, getNanos) is a valid lexicographic key: within one
  // millisecond getTime ties and nanos decides; across milliseconds
  // getTime decides.
  private def lwwKey(ts: java.sql.Timestamp, eventId: Long): (Long, Int, Long) =
    (ts.getTime, ts.getNanos, eventId)

  private[streaming] def lwwWinner(
      uid: Long, etype: String,
      prev: Option[LatestState],
      incoming: Seq[EventRow]): Option[LatestState] =
    if (incoming.isEmpty) None
    else {
      // prev competes with its OWN stored event_id (not a sentinel): an
      // equal-timestamp event with a higher event_id arriving in a later
      // micro-batch must still win, exactly as a batch recompute with
      // tieCol=event_id would decide it
      val candidates = prev.toSeq.map(s => (lwwKey(s.ts, s.event_id), s)) ++
        incoming.map(e =>
          (lwwKey(e.ts, e.event_id), LatestState(uid, etype, e.value, e.ts, e.event_id, 0)))
      val winner = candidates.maxBy(_._1)._2
      if (prev.exists(p => p.ts == winner.ts && p.event_id == winner.event_id)) None
      else Some(winner.copy(version = prev.map(_.version).getOrElse(0) + 1))
    }

  private def lwwAdvance(
      uid: Long, etype: String,
      events: Iterator[EventRow],
      state: GroupState[LatestState]): Option[LatestState] = {
    // pre-reduce the iterator to its single LWW winner: a hot key's
    // micro-batch must never materialize in executor memory (events.toSeq
    // was O(batch) allocations; maxByOption streams at O(1))
    val best = events.maxByOption(e => lwwKey(e.ts, e.event_id))
    val next = lwwWinner(uid, etype, state.getOption, best.toSeq)
    next.foreach(state.update)
    next
  }

  /** B2 streaming — last-write-wins online snapshot via keyed state: the
    * streaming equivalent of Latest.lwwUpsert. Emits an update whenever a
    * key's latest value changes; `version` counts those EMITTED state
    * transitions — the streaming analogue of the reference's per-write
    * version (feature_server.py:437), but note it advances once per
    * state-changing micro-batch, not once per raw event, so its value
    * depends on delivery batching (losing writes never advance it). State is per (user_id, event_type) — at scale
    * this is hash-partitioned stream state, the exact shape RocksDB state
    * stores shard.
    */
  def latestStateStream(stream: Dataset[EventRow]): Dataset[LatestState] = {
    import stream.sparkSession.implicits._
    stream
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LatestState, LatestState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((uid, etype), events, state: GroupState[LatestState]) =>
          lwwAdvance(uid, etype, events, state).iterator
      }
  }

  /** Online-store entry with lifecycle flag: `expired = true` marks a
    * TTL-evicted key (tombstone for the downstream sink to delete). */
  case class OnlineEntry(
      user_id: Long, event_type: String, value: Double,
      ts: java.sql.Timestamp, version: Int, expired: Boolean)

  /** B2 streaming with state TTL — the reference's stale→expired lifecycle
    * (ServingConfig.stale_threshold_seconds = 86400,
    * feature_server.py:108: entries past the threshold leave the online
    * store) as an event-time timeout on keyed state. When no new
    * observation arrives for `ttl` past a key's latest event time, the
    * state is dropped and a tombstone (`expired = true`) is emitted so the
    * sink can delete the row. Without this, online-store state grows
    * monotonically with key cardinality — at 100 TB scale TTL eviction is
    * what keeps the state store bounded.
    */
  def latestStateStreamTtl(
      stream: Dataset[EventRow],
      ttl: java.time.Duration,
      watermark: String = "10 minutes"): Dataset[OnlineEntry] = {
    import stream.sparkSession.implicits._
    val ttlMs = ttl.toMillis
    stream
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LatestState, OnlineEntry](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case ((uid, etype), events, state: GroupState[LatestState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(OnlineEntry(uid, etype, s.value, s.ts, s.version, expired = true))
          } else {
            val out = lwwAdvance(uid, etype, events, state)
              .map(n => OnlineEntry(uid, etype, n.value, n.ts, n.version, expired = false))
            // re-arm the TTL clock off the stored latest observation; the
            // timeout timestamp must sit beyond the current watermark or
            // Spark rejects it, hence the clamp
            state.getOption match {
              case Some(latest) =>
                state.setTimeoutTimestamp(
                  math.max(latest.ts.getTime + ttlMs, state.getCurrentWatermarkMs() + 1))
              case None => // empty batch for this key and no prior state: nothing to arm
            }
            out.iterator
          }
      }
  }

  /** B2 streaming on the transformWithState API (Spark 4's arbitrary-state
    * v2): same LWW semantics as [[latestStateStream]] via the same
    * [[lwwWinner]] core, but state is a typed ValueState with a DECLARATIVE
    * processing-time TTL — Spark evicts expired entries inside the state
    * store itself (no timer bookkeeping, no tombstone pass). Requires the
    * RocksDB state-store provider ([[rocksDbStateConf]]).
    */
  class LatestProcessor(ttl: java.time.Duration)
    extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, String), EventRow, LatestState] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues, ValueState}
    @transient private var state: ValueState[LatestState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LatestState](
        "latest",
        org.apache.spark.sql.Encoders.product[LatestState],
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(
        key: (Long, String),
        rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[LatestState] = {
      val prev = if (state.exists()) Some(state.get()) else None
      // same O(1)-memory pre-reduction as lwwAdvance
      val best = rows.maxByOption(e => lwwKey(e.ts, e.event_id))
      val next = lwwWinner(key._1, key._2, prev, best.toSeq)
      next.foreach(state.update)
      next.iterator
    }
  }

  def latestStateTws(
      stream: Dataset[EventRow],
      ttl: java.time.Duration = null): Dataset[LatestState] = {
    import stream.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    stream
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(
        new LatestProcessor(ttl),
        // ProcessingTime (required by TTL) keeps the micro-batch engine
        // ticking even with no input — only opt into that when a TTL
        // actually needs the clock
        if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime(),
        OutputMode.Update())
  }

  /** G4 — stream-stream interval join (online attribution): each purchase
    * event joined to the same user's click events that happened within
    * `attributionWindow` before it. Both sides carry watermarks and the
    * join condition bounds event time in BOTH directions, so Spark can
    * size the join state and evict rows as the watermark advances —
    * without the time bounds, stream-stream join state grows forever.
    * This is the online form of the batch interval join (a7).
    */
  def attributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      attributionWindow: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).select(
      col("user_id"), col("ts").as("click_ts"),
      col("event_id").as("click_id"), col("value").as("click_value"))
    val p = purchases.withWatermark("ts", watermark).select(
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
      col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    c.join(
      p,
      col("user_id") === col("p_user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attributionWindow"))
      .drop("p_user_id")
  }

  /** State-store settings for production-size keyed state: RocksDB keeps
    * state off-heap + on local disk (the default HDFS-backed provider holds
    * every versioned map in executor memory), and changelog checkpointing
    * ships per-batch deltas instead of full SST snapshots. Apply via
    * `configs.foreach { case (k, v) => spark.conf.set(k, v) }` before
    * starting stateful queries.
    */
  val rocksDbStateConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** Run a finite micro-batch of a streaming DataFrame into an in-memory
    * table and return it (test/verification helper — production sinks are
    * writeStream.toTable / foreachBatch MERGE).
    */
  def runToMemory(spark: SparkSession, out: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = out.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
