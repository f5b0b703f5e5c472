package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming stateful operator surface (SURVEY §2.2 streaming
  * rows): watermarked window aggregation, stateful dedup, stream-stream
  * join, and arbitrary state via flatMapGroupsWithState.
  *
  * All state is keyed by user_id — the state store partitions on the
  * grouping key, so state size per executor is bounded by keys/partitions
  * regardless of total stream volume; watermarks bound retained state in
  * time. That is the 100 TB/day stance: no unbounded state anywhere.
  */
object StatefulOps {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Watermarked tumbling-window aggregation (append mode: windows finalize
    * once the watermark passes their end; late rows beyond 10m are dropped).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** CHAINED time-window aggregation (Spark >= 3.4): 1-hour tumbling counts
    * re-aggregated into 6-hour blocks by windowing ON the first level's
    * window column — the multi-resolution rollup a metrics pipeline runs
    * without a second pass over raw events. The window struct carries
    * event-time semantics through the first aggregation, so the single
    * upstream watermark governs finalization of BOTH levels, and the
    * second agg's input is already one row per (hour, type) — state and
    * shuffle shrink by the first level's reduction factor.
    */
  def chainedWindowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(col("window"), "6 hours"), col("event_type"))
      .agg(sum(col("n")).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Watermarked SLIDING-window aggregation: 6-hour windows every 3 hours —
    * each event lands in window-length/slide windows (2 here); the state
    * multiplier is the overlap factor, still bounded by the watermark.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Watermarked SESSION-window aggregation: per-user sessions close after a
    * 30-minute event-time gap. Session state merges adjacent windows as rows
    * arrive and finalizes (append mode) once the watermark passes the
    * session end + gap.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n"))

  /** Stateful dedup bounded by watermark: duplicate event_ids arriving
    * within the watermark horizon are dropped; state for old ids is evicted
    * as the watermark advances (vs. dropDuplicates whose state grows forever).
    */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Plain unbounded streaming dedup (SURVEY §2.2 names both forms): no
    * watermark, so a duplicate id is dropped no matter how late it arrives —
    * at the cost of state that grows with distinct keys forever. Use the
    * watermarked form whenever the dedup horizon is finite.
    */
  def dedupUnbounded(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Stream-stream interval join: each error joined to clicks of the same
    * user within the preceding hour. Both sides watermarked — Spark can
    * evict buffered rows once outside the join window.
    */
  def clickErrorJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      .withWatermark("e_ts", "10 minutes")
    errors.join(clicks,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("error_id"), col("click_id"), col("e_user").as("user_id"))
  }

  /** Stream-stream interval join feeding a DOWNSTREAM windowed aggregation
    * in the SAME streaming query — two stateful operators chained
    * join→window (st17 chains window→window; this is the other composite
    * shape, the "join the firehose, then rate it" pipeline). Spark runs it
    * via watermark PROPAGATION (SPARK-42376): the aggregation cannot use
    * the raw source watermark, because the join keeps emitting pairs whose
    * event time lags it by up to the 1-hour join interval — so the
    * simulated output watermark of the join (min over sides, minus the
    * interval) is what gates the agg's late filter and window eviction.
    * Per-operator watermarking would finalize windows while the join can
    * still emit into them, losing pairs; st21's oracle-gated replay is
    * exactly the proof that the propagated value decides. Upgrade canary:
    * WatermarkCanarySpec pins the min-sides-minus-interval rule directly,
    * so a Spark version that changes it fails there by name.
    */
  def joinWindowCounts(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      .withWatermark("e_ts", "10 minutes")
    errors.join(clicks,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"))
      .groupBy(window(col("e_ts"), "6 hours"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("error_id") + col("click_id")).as("id_checksum"))
      .select(col("window.start").as("window_start"), col("n_pairs"), col("id_checksum"))
  }

  /** Watermarked dedup feeding a DOWNSTREAM windowed aggregation in the
    * SAME streaming query — the third composite stateful chain
    * (join→window = [[joinWindowCounts]], window→window =
    * [[chainedWindowCounts]]): the at-least-once firehose pattern "drop
    * transport duplicates, then rate what's left". The dedup operator
    * passes its input watermark through unchanged (its state horizon is
    * the watermark itself, no event-time shift), so the aggregation
    * finalizes off the same propagated value — but rows now reach the agg
    * only AFTER clearing the dedup state store, so a duplicate leaking
    * through (or a false drop) shifts a window count by exactly one and
    * breaks the oracle hash. The ONE `withWatermark` (inside the dedup
    * stage) governs both operators — Spark rejects redefining the
    * watermark downstream of a stateful operator, which is itself the
    * propagation contract this row certifies.
    */
  def dedupWindowCounts(events: DataFrame): DataFrame =
    dedupWithinWatermark(events)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** STREAMING normalized dedup — the reference's north-star dedup applied
    * to a document stream: each doc is fingerprinted with the SAME
    * order-insensitive token-set md5 the batch family uses (d2 census, d8
    * drop list, t4 fingerprint), then `dropDuplicates` on the fingerprint
    * keeps the first arrival of each content class. State is one fingerprint
    * per distinct content — the streaming twin of d8's keeper rule (first
    * arrival ~ min doc_id under ordered ingest). Pass a watermarked frame
    * and swap in dropDuplicatesWithinWatermark when the dedup horizon is
    * finite — same fingerprint, bounded state.
    */
  def dedupDocStream(docs: DataFrame): DataFrame =
    docs.withColumn("fp",
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))))
      .dropDuplicates("fp")

  /** LEFT-OUTER stream-stream interval join: like [[clickErrorJoin]] but an
    * error with no matching click still emits — with a null click_id — once
    * the watermark proves no qualifying click can still arrive. The
    * null-side emission is watermark-DRIVEN, not timer-driven: the row is
    * held in the state store exactly until the global watermark passes the
    * end of its join window, so state stays bounded the same way as the
    * inner form. This is the shape for "every error must surface, matched
    * or not" pipelines.
    */
  def clickErrorJoinOuter(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      .withWatermark("e_ts", "10 minutes")
    errors.join(clicks,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("error_id"), col("click_id"), col("e_user").as("user_id"))
  }

  /** Stream-stream FULL-outer interval join — completes the stream-stream
    * join-type family (inner and left-outer above): unmatched errors AND
    * unmatched clicks each emit with a null other side, in both cases only
    * after the watermark passes the end of their join window (same bounded
    * state as the inner form — the null-side emission is a state-eviction
    * byproduct, not extra buffering).
    */
  def clickErrorJoinFull(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      .withWatermark("e_ts", "10 minutes")
    errors.join(clicks,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"),
      "full_outer")
      .select(col("error_id"), col("click_id"),
        coalesce(col("e_user"), col("c_user")).as("user_id"))
  }

  /** RIGHT-outer stream-stream interval join — the mirror of
    * [[clickErrorJoinOuter]], preserving the build side instead: a click
    * with no error in its window emits with a null error_id once the
    * watermark closes the window. Spark implements right-outer by swapping
    * the preserved side of the same state-store machinery, so state bounds
    * and eviction timing are identical to the left form; registering it
    * completes the inner/left/right/full interval-join family.
    */
  def clickErrorJoinRight(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"), col("event_id").as("error_id"))
      .withWatermark("e_ts", "10 minutes")
    errors.join(clicks,
      col("c_user") === col("e_user") &&
        col("c_ts") <= col("e_ts") && col("c_ts") >= col("e_ts") - expr("INTERVAL 1 HOUR"),
      "right_outer")
      .select(col("error_id"), col("click_id"), col("c_user").as("user_id"))
  }

  /** Stream-static enrichment join: each streaming event picks up
    * attributes from a static (batch) dimension on user_id. The static side
    * is broadcast per micro-batch — no state store involved (unlike
    * stream-stream joins), no watermark needed, and the dim is re-read each
    * batch so slowly-changing dimensions stay fresh. The 100 TB/day shape
    * for enriching an event firehose against reference data.
    */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), Seq("user_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"), col("value"))

  /** transformWithState (Spark 4 arbitrary-state API, successor of
    * flatMapGroupsWithState): per-user event counter held in ValueState.
    * Requires the RocksDB state store provider — set
    * `spark.sql.streaming.stateStore.providerClass` to
    * RocksDBStateStoreProvider on the writeStream session.
    *
    * Rounding discipline (shared by every totals processor here): state
    * keeps the EXACT unrounded running sum; the half-even cent rounding
    * (math.rint) is applied only in the EMITTED row. Rounding inside state
    * would compound one-cent drift across micro-batches relative to the
    * oracle's single round(sum(all), 2) — round-on-emit makes the stream
    * total equal the batch total by construction, independent of how the
    * fixture's values are quantized.
    */
  class UserCountProcessor(
      ttl: org.apache.spark.sql.streaming.TTLConfig =
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserRunning] {
    @transient private var countState: org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      countState = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning], ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      val prev = Option(countState.get()).getOrElse(UserRunning(key, 0L, 0.0))
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      countState.update(UserRunning(key, n, total))
      Iterator.single(UserRunning(key, n, math.rint(total * 100) / 100))
    }
  }

  final case class UserTypeActivity(user_id: Long, event_type: String,
      n_type: Long, topk_sum: Double)

  /** Composite-state processor exercising the transformWithState state
    * surface beyond ValueState: a MapState (per-event-type counters — the
    * keyed sub-aggregation pattern) plus a ListState holding only the
    * TOP-K values ever seen for the user (trimmed on every write — the
    * bounded-buffer discipline: list state that only appends grows without
    * bound at 100 TB/day; this one is capped at K elements by
    * construction). Emits one row per event type seen in the batch with
    * its running count and the current top-K sum.
    */
  class UserActivityProcessor(topK: Int = 3)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTypeActivity] {
    @transient private var typeCounts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var topVals: org.apache.spark.sql.streaming.ListState[Double] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      typeCounts = getHandle.getMapState[String, Long](
        "type_counts", Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      topVals = getHandle.getListState[Double](
        "top_vals", Encoders.scalaDouble,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTypeActivity] = {
      val batchTypes = scala.collection.mutable.LinkedHashSet.empty[String]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Double]
      rows.foreach { e =>
        val n = if (typeCounts.containsKey(e.event_type)) typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, n + 1L)
        batchTypes += e.event_type
        vals += e.value
      }
      // merge batch values into the capped top-K buffer (sorted, so the
      // result is independent of intra-batch row order)
      val merged = (topVals.get().toSeq ++ vals).sorted.reverse.take(topK)
      topVals.put(merged.toArray)
      val topSum = math.rint(merged.sum * 100) / 100
      batchTypes.iterator.map { t =>
        UserTypeActivity(key, t, typeCounts.getValue(t), topSum)
      }
    }
  }

  /** transformWithState wiring for [[UserActivityProcessor]]. */
  def userActivityTWS(events: Dataset[Event]): Dataset[UserTypeActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserActivityProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** transformWithState wiring for [[UserCountProcessor]]. */
  def runningTotalsTWS(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** transformWithState with state TTL: each user's ValueState expires
    * `ttl` of PROCESSING time after its last write and the counter restarts
    * from zero. At 100 TB/day the eviction path IS the feature — without a
    * TTL (or timeout) every key ever seen stays in the store forever; with
    * it, state size is bounded by the active-key working set. TTL requires
    * TimeMode.ProcessingTime.
    */
  def runningTotalsTWSWithTTL(events: Dataset[Event], ttl: java.time.Duration): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(
        new UserCountProcessor(org.apache.spark.sql.streaming.TTLConfig(ttl)),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(), OutputMode.Update())
  }

  final case class UserFlush(user_id: Long, n_events: Long, flushed: Boolean)

  /** PROCESSING-TIME timers — the other TimeMode (st25 certifies
    * event-time): the cache-expiry / heartbeat shape, where a key's state
    * flushes one WALL-CLOCK idle period after its last event regardless of
    * event time (no watermark exists in this mode). Each input batch
    * cancels the key's previous deadline (listTimers + deleteTimer — the
    * reset-on-activity discipline; without it every batch leaves a stale
    * timer that fires early) and registers last-seen + idleMs; expiry
    * emits the flush row and CLEARS state, so an idle key costs nothing
    * after one idle period — the same bounded-state contract TTL gives,
    * but with an emission on the way out (TTL evicts silently).
    * Wall-clock behavior is suite-certified, not oracle-gated: a
    * processing-time deadline is not a deterministic function of the
    * input, so no replay hash can pin it.
    */
  class ProcessingTimeFlushProcessor(idleMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserFlush] {
    @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserFlush] = {
      val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
      cnt.update(n)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + idleMs)
      Iterator.single(UserFlush(key, n, flushed = false))
    }

    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[UserFlush] = {
      if (!cnt.exists()) Iterator.empty
      else {
        val n = cnt.get()
        cnt.clear()
        Iterator.single(UserFlush(key, n, flushed = true))
      }
    }
  }

  /** transformWithState wiring for [[ProcessingTimeFlushProcessor]]. */
  def processingTimeFlushTWS(events: Dataset[Event], idleMs: Long): Dataset[UserFlush] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ProcessingTimeFlushProcessor(idleMs),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** [[UserRunning]] with an EVOLVED state schema: `max_value` added as an
    * Option (Avro nullable union with a null default — the evolution shape
    * the state store can resolve against old rows without a backfill).
    * State restored from a pre-evolution checkpoint reads max_value = None;
    * the processor then tracks the running max over every event it sees
    * POST-upgrade, which is what makes the field oracle-computable: the
    * two-phase harness's chunk boundary decides exactly which events those
    * are.
    */
  final case class UserRunningV2(
      user_id: Long, n_events: Long, total_value: Double, max_value: Option[Double])

  /** [[UserCountProcessor]] after the upgrade: same state NAME ("running" —
    * schema evolution applies to the existing column family; a renamed
    * state would be a fresh empty store), widened state type, and V1's
    * exact accumulation arithmetic (unrounded state, round-on-emit) so the
    * inherited totals continue bit-identically across the restart.
    */
  class UserCountProcessorV2
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserRunningV2] {
    @transient private var countState: org.apache.spark.sql.streaming.ValueState[UserRunningV2] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      countState = getHandle.getValueState[UserRunningV2](
        "running", Encoders.product[UserRunningV2],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunningV2] = {
      val prev = Option(countState.get()).getOrElse(UserRunningV2(key, 0L, 0.0, None))
      var n = prev.n_events
      var total = prev.total_value
      var mx = prev.max_value
      rows.foreach { e =>
        n += 1; total += e.value
        mx = Some(mx.fold(e.value)(math.max(_, e.value)))
      }
      // State keeps the EXACT running sum; rounding happens only in the
      // emitted row (see UserCountProcessor scaladoc) — so the inherited V1
      // total continues exactly, and emission = round(sum(history), 2).
      countState.update(UserRunningV2(key, n, total, mx))
      Iterator.single(UserRunningV2(key, n, math.rint(total * 100) / 100, mx))
    }
  }

  /** transformWithState wiring for [[UserCountProcessorV2]]. */
  def runningTotalsTWSV2(events: Dataset[Event]): Dataset[UserRunningV2] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserCountProcessorV2,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** [[UserCountProcessor]] with INITIAL STATE — the batch-bootstrap →
    * streaming handoff (StatefulProcessorWithInitialState): a new streaming
    * deployment almost never starts from zero; it takes over from a batch
    * job whose accumulated per-key aggregates must become the stream's
    * opening state, or the key history silently restarts at zero. Spark
    * processes the initial-state relation exactly once, in the FIRST
    * micro-batch of a fresh checkpoint, calling [[handleInitialState]] per
    * key before any input rows — keys present only in the seed keep their
    * state silently (no emission) until the stream first touches them.
    * Accumulation arithmetic is [[UserCountProcessor]]'s verbatim, so a
    * seeded stream and a stream that saw the full history emit identical
    * totals — the property st31's oracle hashes.
    */
  class SeededTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, UserRunning, UserRunning] {
    @transient private var countState: org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      countState = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInitialState(key: Long, initial: UserRunning,
        timers: org.apache.spark.sql.streaming.TimerValues): Unit =
      countState.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      val prev = Option(countState.get()).getOrElse(UserRunning(key, 0L, 0.0))
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      // Same round-on-emit discipline as [[UserCountProcessor]] — the seed
      // (handed off unrounded by st31) plus the streamed tail accumulate
      // exactly, so the emission equals round(sum(full history), 2) with no
      // per-batch drift and no dependence on the seed job's rounding mode.
      countState.update(UserRunning(key, n, total))
      Iterator.single(UserRunning(key, n, math.rint(total * 100) / 100))
    }
  }

  /** transformWithState wiring for [[SeededTotalsProcessor]]: `seed` must be
    * a BATCH dataset (the handed-off aggregate), keyed like the stream.
    */
  def seededRunningTotalsTWS(events: Dataset[Event],
      seed: Dataset[UserRunning]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SeededTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update(),
        seed.groupByKey(_.user_id))
  }

  final case class UserSession(user_id: Long, n_events: Long, last_ts: java.sql.Timestamp)

  /** transformWithState with EVENT-TIME TIMERS — the modern
    * registerTimer/handleExpiredTimer lifecycle (successor of
    * [[idleSessionSummaries]]'s GroupStateTimeout), emitting per-user
    * idle-gap session summaries. GAP-AWARE WITHIN A BATCH, which is what
    * makes the operator's output the exact gaps-and-islands relation
    * independent of how micro-batches cut the stream (a batch spanning
    * hours may contain several complete sessions of one user):
    *
    *   - handleInputRows sorts the batch's rows in event-time order, folds
    *     them onto the open session from ValueState splitting on the
    *     30-minute gap, EMITS every session the fold closes (closure is
    *     proven by a later same-user event, no watermark needed), keeps
    *     the last one open in state, and registers a timer at its
    *     last-event-time + gap;
    *   - handleExpiredTimer fires once the watermark passes a registered
    *     deadline: if the CURRENT open session's deadline matches, it is
    *     emitted and the state CLEARED — the state-lifecycle discipline
    *     (one idle gap past the last event, never forever). Timers
    *     registered before later events arrived fire stale; they are
    *     recognized (expiry < current deadline, or no state) and ignored.
    */
  class IdleSessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserSession] {
    @transient private var sess: org.apache.spark.sql.streaming.ValueState[UserSession] = _
    private val GapMs = 30L * 60 * 1000

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      sess = getHandle.getValueState[UserSession]("sess",
        Encoders.product[UserSession], org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      var open = Option(sess.get())
      sorted.foreach { e =>
        open match {
          case Some(cur) if e.ts.getTime >= cur.last_ts.getTime + GapMs =>
            closed += cur // a later event proves the gap: session closed
            open = Some(UserSession(key, 1L, e.ts))
          case Some(cur) =>
            open = Some(UserSession(key, cur.n_events + 1,
              if (e.ts.after(cur.last_ts)) e.ts else cur.last_ts))
          case None =>
            open = Some(UserSession(key, 1L, e.ts))
        }
      }
      open.foreach { cur =>
        sess.update(cur)
        getHandle.registerTimer(cur.last_ts.getTime + GapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[UserSession] = {
      val cur = sess.get()
      if (cur != null && info.getExpiryTimeInMs >= cur.last_ts.getTime + GapMs) {
        sess.clear()
        Iterator.single(cur)
      } else Iterator.empty // stale deadline from before a later event arrived
    }
  }

  /** transformWithState wiring for [[IdleSessionProcessor]]: event-time
    * mode (timers fire off the watermark), RocksDB-backed like every TWS
    * operator.
    */
  def idleSessionsTWS(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new IdleSessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Update())
  }

  final case class WindowTopK(window_start: java.sql.Timestamp, rnk: Int,
      event_type: String, n: Long)

  /** Streaming PER-WINDOW TOP-K — the "trending types per window" operator,
    * which Spark's declarative surface cannot express in a stream: rank
    * AFTER a windowed aggregation needs the whole window's groups, and no
    * streaming output mode supports a window function downstream of an agg.
    * The TWS shape: key = tumbling-window start, a MapState holds the
    * window's per-type counters (state per key is O(|distinct types|),
    * NEVER O(rows) — the bounded-state contract), and ONE event-time timer
    * per window emits the ranked top-k exactly when the watermark passes
    * the window end, then clears the state. Emission is deterministic:
    * exact integer counts, rank ordered by (n DESC, type ASC).
    *
    * Scale shape: this is a two-level aggregation — rows shuffle once on
    * the window key, counters live in the store, and the per-window sort
    * at expiry ranks |distinct types| entries, not rows. A 100 TB/day
    * deployment keys on (window, coarse shard) and re-merges the k-bounded
    * shard winners if a single window's type cardinality outgrows one
    * store (not needed for a type-bounded domain like this one).
    */
  class WindowTopKProcessor(k: Int = 3, windowMs: Long = 6L * 3600 * 1000)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, WindowTopK] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      counts = getHandle.getMapState[String, Long]("win_type_counts",
        Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[WindowTopK] = {
      rows.foreach { e =>
        val n = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, n + 1L)
      }
      // one deadline per window — the window END is a pure function of the
      // key, so re-registration across batches is the same timestamp and
      // only the first needs to stick
      val deadline = key + windowMs
      if (!getHandle.listTimers().contains(deadline))
        getHandle.registerTimer(deadline)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[WindowTopK] = {
      val all = counts.iterator().toSeq
      counts.clear()
      all.sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex.map {
        case ((t, n), i) =>
          WindowTopK(new java.sql.Timestamp(key), i + 1, t, n)
      }.iterator
    }
  }

  /** transformWithState wiring for [[WindowTopKProcessor]]: rows are keyed
    * by their tumbling-window start (epoch-ms floor — the same bucketing
    * `window(ts, "6 hours")` computes), event-time mode so the per-window
    * timer fires off the watermark.
    *
    * The epoch-ms floor aligns buckets to the UTC epoch, which coincides
    * with `window(ts, ...)`-style session-local bucketing only when the
    * session timezone has zero offset — in any other zone the operator's
    * buckets would silently shift relative to what a local-time oracle
    * computes. Pinned with an assertion rather than papered over: a
    * deployment in another zone should key on an explicitly zoned floor,
    * not inherit a silent shift.
    */
  def windowTopKTWS(events: Dataset[Event], k: Int = 3,
      windowMs: Long = 6L * 3600 * 1000): Dataset[WindowTopK] = {
    import events.sparkSession.implicits._
    val tz = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rules = java.time.ZoneId.of(tz).getRules
    require(rules.isFixedOffset &&
      rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
      s"windowTopKTWS keys windows on the epoch-ms floor, which matches " +
        s"session-local tumbling windows only under a zero-offset session " +
        s"timezone; session is '$tz' — set spark.sql.session.timeZone=UTC " +
        "or derive the key from an explicitly zoned floor")
    events.withWatermark("ts", "10 minutes")
      .groupByKey(e => e.ts.getTime - java.lang.Math.floorMod(e.ts.getTime, windowMs))
      .transformWithState(new WindowTopKProcessor(k, windowMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
  }

  final case class ShardWinner(window_start: java.sql.Timestamp,
      window_end: java.sql.Timestamp, event_type: String, n: Long)

  /** Stage 1 of the HOT-KEY top-k: the (window, shard) PRE-AGGREGATE that
    * [[WindowTopKProcessor]]'s scaladoc sketches. The window key is 100%
    * hot by construction — every row of a 6 h interval lands on ONE state
    * key — so a single-store per-window operator serializes the whole
    * window's traffic through one state partition (the straggler). Keying
    * on (window, hash(type) % shards) instead spreads that traffic across
    * `shards` stores while keeping the re-merge EXACT: the shard is a
    * function of the GROUPING key (the type), so each type's counter lives
    * wholly in one shard and a shard's local top-k winners are globally
    * complete candidates — merging the ≤ shards·k winners reproduces the
    * unsharded top-k bit-for-bit (the two-level exact top-k; same
    * decomposition as a partial+final hash aggregate, lifted to ranked
    * state). State per key stays O(|types in shard|); emission stays one
    * event-time timer per (window, shard), all shards of a window firing
    * in the SAME micro-batch (identical deadline, same eviction watermark
    * comparison).
    */
  class ShardTopKProcessor(k: Int, windowMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[(Long, Int), Event, ShardWinner] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      counts = getHandle.getMapState[String, Long]("shard_type_counts",
        Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: (Long, Int), rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[ShardWinner] = {
      rows.foreach { e =>
        val n = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, n + 1L)
      }
      val deadline = key._1 + windowMs
      if (!getHandle.listTimers().contains(deadline))
        getHandle.registerTimer(deadline)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (Long, Int),
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ShardWinner] = {
      val all = counts.iterator().toSeq
      counts.clear()
      // k-bounded emission: the shard's own top-k are the only rows that
      // can place in the merged top-k (every counter here is type-complete)
      all.sortBy { case (t, n) => (-n, t) }.take(k).map { case (t, n) =>
        ShardWinner(new java.sql.Timestamp(key._1),
          new java.sql.Timestamp(key._1 + windowMs), t, n)
      }.iterator
    }
  }

  /** Stage 2: the K-BOUNDED RE-MERGE. Input volume per window is ≤
    * shards·k winner rows — constant, not data-sized — and ALL of a
    * window's shards emit in the same micro-batch (stage 1's timers share
    * the window-end deadline, and timer firing is a per-batch global
    * watermark comparison), so the merge needs no cross-batch state: rank
    * the batch's winners for the key and emit. A crash mid-batch replays
    * the whole micro-batch — both stages re-run — so the same-batch
    * contract survives restart.
    */
  class TopKMergeProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ShardWinner, WindowTopK] {
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = ()

    override def handleInputRows(key: Long, rows: Iterator[ShardWinner],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[WindowTopK] = {
      rows.toSeq.sortBy(w => (-w.n, w.event_type)).take(k).zipWithIndex.map {
        case (w, i) => WindowTopK(w.window_start, i + 1, w.event_type, w.n)
      }.iterator
    }
  }

  /** Two chained stateful operators in ONE streaming query — Spark 4's
    * `transformWithState(processor, eventTimeColumnName, mode)` overload
    * re-stamps stage 1's output event time as `window_end`, which is what
    * lets a second stateful operator sit downstream of the first in append
    * mode. The stamp is valid by construction: a window fires at the FIRST
    * batch whose eviction watermark passes its end, so `window_end` is
    * always ahead of that batch's late-events watermark (the value
    * UpdateEventTimeColumnExec validates against).
    *
    * Same UTC pin as [[windowTopKTWS]]: the epoch-ms floor matches
    * session-local tumbling windows only under a zero-offset session zone.
    */
  def shardedWindowTopKTWS(events: Dataset[Event], k: Int = 3,
      windowMs: Long = 6L * 3600 * 1000, shards: Int = 8): Dataset[WindowTopK] = {
    import events.sparkSession.implicits._
    val tz = events.sparkSession.sessionState.conf.sessionLocalTimeZone
    val rules = java.time.ZoneId.of(tz).getRules
    require(rules.isFixedOffset &&
      rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0,
      s"shardedWindowTopKTWS keys windows on the epoch-ms floor; session " +
        s"zone is '$tz' — set spark.sql.session.timeZone=UTC")
    val winners = events.withWatermark("ts", "10 minutes")
      .groupByKey { e =>
        val ws = e.ts.getTime - java.lang.Math.floorMod(e.ts.getTime, windowMs)
        (ws, java.lang.Math.floorMod(e.event_type.hashCode, shards))
      }
      .transformWithState(new ShardTopKProcessor(k, windowMs),
        "window_end", OutputMode.Append())
    winners.groupByKey(_.window_start.getTime)
      .transformWithState(new TopKMergeProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** Arbitrary state with EVENT-TIME TIMEOUT eviction: per-user idle-session
    * summary. Events accumulate silently in state; when the watermark passes
    * last-event-time + 30 minutes the timeout callback fires ONCE, emits the
    * session summary, and REMOVES the state — so a key's state lives exactly
    * one idle gap past its last event, never forever. This is the manual
    * (flatMapGroupsWithState) twin of session_window + watermark, and the
    * state-lifecycle discipline any 100 TB/day keyed aggregation needs.
    */
  def idleSessionSummaries(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last_ts + gap: finalize and EVICT
            val out = state.get
            state.remove()
            Iterator.single(out)
          } else {
            val prev = state.getOption.getOrElse(
              UserSession(userId, 0L, new java.sql.Timestamp(0L)))
            var n = prev.n_events
            var last = prev.last_ts
            batch.foreach { e => n += 1; if (e.ts.after(last)) last = e.ts }
            state.update(UserSession(userId, n, last))
            // fire once the watermark passes a 30-minute idle gap
            state.setTimeoutTimestamp(last.getTime + 30L * 60 * 1000)
            Iterator.empty
          }
      }
  }

  /** Arbitrary keyed state: running per-user event count + value sum,
    * emitted on every update (flatMapGroupsWithState, update mode).
    */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          state.update(UserRunning(userId, n, total))
          Iterator.single(UserRunning(userId, n, math.rint(total * 100) / 100))
      }
  }
}
