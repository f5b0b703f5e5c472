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
    */
  class UserCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserRunning] {
    @transient private var countState: org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      import org.apache.spark.sql.Encoders
      countState = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
      val prev = Option(countState.get()).getOrElse(UserRunning(key, 0L, 0.0))
      var n = prev.n_events
      var total = prev.total_value
      rows.foreach { e => n += 1; total += e.value }
      val next = UserRunning(key, n, math.rint(total * 100) / 100)
      countState.update(next)
      Iterator.single(next)
    }
  }

  /** transformWithState wiring for [[UserCountProcessor]]. */
  def runningTotalsTWS(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
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
          val next = UserRunning(userId, n, math.rint(total * 100) / 100)
          state.update(next)
          Iterator.single(next)
      }
  }
}
