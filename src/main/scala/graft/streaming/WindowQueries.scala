package graft.streaming

import org.apache.spark.sql.functions._

import graft.core.{Q, Tables}

/** Event-time window operators over `events` (SURVEY §2.2 streaming rows:
  * tumbling / sliding / session windows). Each runs identically in batch
  * mode (verified against the DuckDB oracle here) and in Structured
  * Streaming (same expressions over readStream — exercised with
  * MemoryStream in the test suites, where watermarking applies).
  *
  * Spark's `window()` buckets align to the epoch; DuckDB's `time_bucket`
  * aligns to 2000-01-01 — identical boundaries for divisors of a day.
  */
object WindowQueries {

  /** w1: tumbling 6-hour windows per event type. */
  val w1 = Q(
    "w1_tumbling_window",
    """SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** w2: sliding windows (12h length, 6h slide) — each event lands in two
    * windows; Spark's window() expands them natively, the oracle unnests the
    * two bucket starts.
    */
  val w2 = Q(
    "w2_sliding_window",
    """SELECT window_start, count(*) AS n, round(avg(value), 2) AS avg_value FROM (
      |  SELECT unnest([time_bucket(INTERVAL 6 HOUR, ts),
      |                 time_bucket(INTERVAL 6 HOUR, ts) - INTERVAL 6 HOUR]) AS window_start,
      |         value
      |  FROM events) t
      |GROUP BY window_start""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(window(col("ts"), "12 hours", "6 hours"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 2).as("avg_value"))
      .select(col("window.start").as("window_start"), col("n"), col("avg_value"))
  }

  /** w3: session windows with a 5-minute gap per user. Spark closes a
    * session when the next event is >= gap after the previous; the oracle
    * replays that rule as gaps-and-islands (lag + cumulative flag sum).
    */
  val w3 = Q(
    "w3_session_window",
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              >= INTERVAL 5 MINUTE OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
      |  round(sum(value), 2) AS session_value
      |FROM sessions GROUP BY user_id, session_no""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("session_value"))
  }

  val all: Seq[Q] = Seq(w1, w2, w3)
}
