package graft

import java.sql.Timestamp

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Event

/** UPGRADE CANARY for the two engine watermark rules the st12/st15/st16/
  * st21 oracles encode (their scaladoc cross-references this spec):
  *
  *   1. SPARK-40925: a micro-batch carries TWO watermark values — the
  *      late-record filter uses the PREVIOUS batch's watermark (stats of
  *      batches <= b-2, minus delay) while state eviction uses the current
  *      one (batches <= b-1). Observable both in
  *      StreamingQueryProgress.eventTime("watermark") (which lags the
  *      data by one batch) and in a late row that the eviction watermark
  *      would drop but the lagged filter admits into still-live state.
  *
  *   2. SPARK-42376: a stateful operator feeding another stateful operator
  *      in the same query propagates a SIMULATED OUTPUT watermark — for a
  *      stream-stream interval join, min over sides minus the join
  *      interval — and THAT value gates the downstream aggregation's
  *      finalization, not the raw source watermark.
  *
  * If a Spark upgrade changes either rule, those four replay oracles break
  * as opaque hash mismatches; this spec breaks with the rule named in the
  * assertion message. Batch numbering is made deterministic by disabling
  * no-data micro-batches for the duration of each test (a no-data batch
  * advances the watermark without input, collapsing the observable lag).
  */
class WatermarkCanarySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def startStream() = {
    implicit val ctx: SQLContext = spark.sqlContext
    import spark.implicits._
    MemoryStream[Event]
  }

  private def withNoDataBatchesDisabled[A](body: => A): A = {
    val k = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body
    finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("SPARK-40925 canary: progress watermark lags input by one batch; " +
    "late filter lags eviction by one more") {
    import spark.implicits._
    withNoDataBatchesDisabled {
      val ms = startStream()
      // 1-hour tumbling windows, 10-minute delay — small enough that three
      // hand-built batches step the watermark through every regime
      val q = ms.toDF()
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
        .writeStream.format("memory").queryName("wm_canary").outputMode("append")
        .start()
      def wmInstant(): java.time.Instant =
        java.time.Instant.parse(q.lastProgress.eventTime.get("watermark"))

      // batch 0: the watermark DURING it is the epoch (no prior batch stats)
      ms.addData(Event(1, ts("2024-01-01 01:00:00"), 5, "click", 1.0))
      q.processAllAvailable()
      assert(wmInstant() === java.time.Instant.EPOCH,
        "SPARK-40925 one-batch lag broken: batch 0 already saw a non-epoch watermark")

      // batch 1: watermark = batch 0's max event time - 10 min
      ms.addData(Event(2, ts("2024-01-01 05:00:00"), 5, "click", 1.0))
      q.processAllAvailable()
      assert(wmInstant() === ts("2024-01-01 00:50:00").toInstant,
        "SPARK-40925 one-batch lag broken: batch 1's watermark is not batch 0's max - delay")

      // batch 2: eviction watermark = 04:50 (batch 1's max - delay), but the
      // LATE filter still runs at batch 0's 00:50 — so a 01:30 row (below
      // eviction, above late-filter) must be ACCEPTED and merged into the
      // still-live [01:00, 02:00) window, which batch 2's eviction then
      // finalizes with BOTH rows
      ms.addData(
        Event(3, ts("2024-01-01 01:30:00"), 5, "click", 1.0),
        Event(4, ts("2024-01-01 06:00:00"), 5, "click", 1.0))
      q.processAllAvailable()
      assert(wmInstant() === ts("2024-01-01 04:50:00").toInstant)
      q.stop()
      val rows = spark.sql("SELECT ws, n FROM wm_canary").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      assert(rows.get(ts("2024-01-01 01:00:00")) === Some(2L),
        "SPARK-40925 two-value rule broken: the late-filter watermark no longer lags " +
          s"eviction by one batch (expected the 01:30 row admitted; got $rows)")
    }
  }

  test("SPARK-42376 canary: join output watermark (min sides - interval) gates " +
    "the downstream window, not the source watermark") {
    import spark.implicits._
    withNoDataBatchesDisabled {
      val ms = startStream()
      // joinWindowCounts: 1-hour interval join (10-min delay both sides)
      // feeding 6-hour tumbling counts — st21's exact operator chain
      val q = StatefulOps.joinWindowCounts(ms.toDF())
        .writeStream.format("memory").queryName("wm_join_canary").outputMode("append")
        .start()
      def emittedStarts(): Set[Timestamp] =
        spark.sql("SELECT window_start FROM wm_join_canary").collect()
          .map(_.getTimestamp(0)).toSet

      // batch 0: one pair in the [00:00, 06:00) window
      ms.addData(
        Event(1, ts("2024-01-01 01:00:00"), 5, "click", 1.0),
        Event(2, ts("2024-01-01 01:30:00"), 5, "error", 1.0))
      q.processAllAvailable()
      // batch 1: both sides advance to 06:40 → source watermark (visible to
      // batch 2) becomes 06:30, which is PAST the 06:00 window end
      ms.addData(
        Event(3, ts("2024-01-01 06:40:00"), 9, "click", 1.0),
        Event(4, ts("2024-01-01 06:40:00"), 9, "error", 1.0))
      q.processAllAvailable()
      // batch 2: if the agg were gated by the SOURCE watermark (06:30 >=
      // 06:00) the [00:00, 06:00) window would finalize here; the propagated
      // join output watermark is 06:30 - 1 h = 05:30 < 06:00, so it must NOT
      ms.addData(Event(5, ts("2024-01-01 23:00:00"), 7, "click", 1.0))
      q.processAllAvailable()
      assert(!emittedStarts().contains(ts("2024-01-01 00:00:00")),
        "SPARK-42376 propagation broken: the downstream window finalized off the raw " +
          "source watermark instead of the join's simulated output watermark (min sides - interval)")

      // batch 3 advances the ERROR side too (the global watermark is the MIN
      // over sides — batch 2's lone click moved only one of them), and batch
      // 4 lets batch 3's stats take effect: source watermark min(22:50,
      // 23:20) = 22:50 → output watermark 21:50 >= 06:00; now (and only
      // now) the window finalizes, with the batch-0 pair in it
      ms.addData(Event(6, ts("2024-01-01 23:30:00"), 7, "error", 1.0))
      q.processAllAvailable()
      ms.addData(
        Event(7, ts("2024-01-01 23:45:00"), 8, "click", 1.0),
        Event(8, ts("2024-01-01 23:45:00"), 8, "error", 1.0))
      q.processAllAvailable()
      q.stop()
      assert(emittedStarts().contains(ts("2024-01-01 00:00:00")),
        "join->window chain never finalized the first window — the propagated " +
          "output watermark rule has shifted")
      val n = spark.sql(
        "SELECT n_pairs FROM wm_join_canary WHERE window_start = timestamp'2024-01-01 00:00:00'")
        .collect().map(_.getLong(0)).toSeq
      assert(n === Seq(1L), s"expected exactly the batch-0 pair in the first window, got $n")
    }
  }
}
