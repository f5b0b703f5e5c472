package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Observation, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps.Event

/** INLINE OBSERVED METRICS — `Dataset.observe`: the q64 data-quality
  * census computed as a side effect of a pass the pipeline already makes,
  * instead of a second scan. At 100 TB a separate constraint-census job
  * doubles the read; observe() piggybacks codegen'd aggregates on the
  * existing physical plan and surfaces them through the Observation helper
  * (batch) / StreamingQueryProgress.observedMetrics (streaming) — the
  * Deequ-style "metrics while you write" shape. Metrics are advisory
  * telemetry, not query results, so this surface is suite-certified
  * against an independent recompute rather than oracle-gated.
  */
class ObservedMetricsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("batch observe(): constraint census rides the pass, matches a recompute") {
    val events = graft.core.Tables.load(spark, GraftTestSpark.sf, "events")
    val obs = Observation("quality")
    // the observed pass is a REAL pipeline stage (filter + write-shaped
    // count), not a dedicated metrics job
    val observed = events.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col("value") < 0 || col("value").isNull, 1L).otherwise(0L))
        .as("bad_value"),
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user"),
      approx_count_distinct(col("user_id")).as("approx_users"))
    val kept = observed.filter(col("event_type") =!= "view").count()

    val m = obs.get
    val expectRows = events.count()
    assert(m("rows") === expectRows)
    // the census sees the PRE-filter relation (observe sits where it was
    // attached, not at the sink), so 'rows' exceeds the filtered count
    assert(expectRows > kept)
    assert(m("bad_value") === events.filter(col("value") < 0 || col("value").isNull).count())
    assert(m("null_user") === 0L)
    val exactUsers = events.select("user_id").distinct().count()
    val approx = m("approx_users").asInstanceOf[Long]
    assert(math.abs(approx - exactUsers) <= math.max(1L, (exactUsers * 0.05).toLong),
      s"approx_count_distinct drifted: $approx vs $exactUsers")
  }

  test("streaming observe(): per-batch metrics surface in StreamingQueryProgress") {
    import spark.implicits._
    implicit val ctx: SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = ms.toDF()
      .observe("batch_census",
        count(lit(1)).as("rows"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("bad_value"))
      .writeStream
      // the sink must FORCE the batch: observed metrics ride a real pass,
      // and a closure that never triggers an action moves no rows at all
      // (the first draft of this test asserted exactly that, by accident:
      // an ignore-the-batch sink reports rows=0)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
      .start()
    try {
      ms.addData(
        Event(1L, ts("2024-03-01 10:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-03-01 10:01:00"), 2L, "error", -5.0))
      q.processAllAvailable()
      ms.addData(
        Event(3L, ts("2024-03-01 10:02:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      q.recentProgress.foreach { p =>
        Option(p.observedMetrics.get("batch_census")).foreach { row =>
          seen += ((row.getAs[Long]("rows"), row.getAs[Long]("bad_value")))
        }
      }
    } finally q.stop()
    // batch 1: two rows, one negative; batch 2: one clean row — the
    // observed series must contain both censuses in order
    assert(seen.containsSlice(Seq((2L, 1L), (1L, 0L))),
      s"observed per-batch metrics missing or wrong: $seen")
  }
}
