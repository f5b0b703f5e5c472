package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.appendWithExpectations]] + [[LakeSink.readQuarantine]]: the
  * write-time data-quality gate — rule evaluation (incl. null = violation),
  * idempotent retry, and ledger-gated quarantine visibility. The
  * oracle-checked f19 row pins the census; this suite pins the mechanics.
  */
class LakeExpectationsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, typ: String, v: Double) =
    Event(id, ts(f"2024-03-01 10:00:0${id % 10}"), 100 + id, typ, v)

  test("gate splits pass/violate; null rule result is a violation") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_expect") + "/t"
    val rows = Seq(ev(1, "click", 1.0), ev(2, "error", 2.0),
      ev(3, "view", 500.0), ev(4, "error", 600.0)).toDF()
    val rules = Seq(
      "known_type" -> "event_type <> 'error'",
      "value_cap" -> "value <= 300",
      // evaluates to NULL for id=1 — must be treated as a violation
      "null_trap" -> "CASE WHEN event_id = 1 THEN CAST(NULL AS BOOLEAN) ELSE true END")
    assert(LakeSink.appendWithExpectations(spark, lake, rows, rules) == 0L)
    val live = LakeSink.readLake(spark, lake)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(live == Set(), s"expected empty live (every row violates), got $live")
    val q = LakeSink.readQuarantine(spark, lake)
      .select(col("event_id"), col("_violations")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(q == Map(
      1L -> "null_trap",
      2L -> "known_type",
      3L -> "value_cap",
      4L -> "known_type,value_cap"))
  }

  test("retry with a claimed id is a no-op; quarantine is conserved") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_expect_retry") + "/t"
    val rules = Seq("value_cap" -> "value <= 300")
    val b0 = Seq(ev(1, "click", 1.0), ev(2, "view", 400.0)).toDF()
    assert(LakeSink.appendWithExpectations(spark, lake, b0, rules,
      commitId = Some(0L)) == 0L)
    val liveBefore = LakeSink.readLake(spark, lake).count()
    val qBefore = LakeSink.readQuarantine(spark, lake).count()
    // crash-retry of the committed batch: ledger no-op, nothing doubles
    assert(LakeSink.appendWithExpectations(spark, lake, b0, rules,
      commitId = Some(0L)) == 0L)
    assert(LakeSink.readLake(spark, lake).count() == liveBefore)
    assert(LakeSink.readQuarantine(spark, lake).count() == qBefore)
    // next batch appends normally
    assert(LakeSink.appendWithExpectations(spark, lake,
      Seq(ev(3, "view", 3.0), ev(4, "view", 999.0)).toDF(), rules,
      commitId = Some(1L)) == 1L)
    assert(LakeSink.readLake(spark, lake).count() == liveBefore + 1)
    assert(LakeSink.readQuarantine(spark, lake).count() == qBefore + 1)
  }

  test("quarantine of an uncommitted batch stays invisible") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_expect_vis") + "/t"
    val rules = Seq("value_cap" -> "value <= 300")
    assert(LakeSink.appendWithExpectations(spark, lake,
      Seq(ev(1, "click", 1.0), ev(2, "view", 400.0)).toDF(), rules) == 0L)
    // simulate a crash AFTER the quarantine write, BEFORE the commit: a
    // quarantine dir whose _commit_id is beyond the ledger head
    Seq(ev(9, "view", 999.0)).toDF()
      .withColumn("_violations", lit("value_cap"))
      .withColumn("_commit_id", lit(7L))
      .write.mode("overwrite")
      .parquet(s"$lake/_graft_quarantine/b7")
    val visible = LakeSink.readQuarantine(spark, lake)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(visible == Set(2L), "uncommitted quarantine rows leaked")
  }

  test("orphaned quarantine stays invisible when its id is claimed by a plain append") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_expect_orphan") + "/t"
    val rules = Seq("value_cap" -> "value <= 300")
    assert(LakeSink.appendWithExpectations(spark, lake,
      Seq(ev(1, "click", 1.0), ev(2, "view", 400.0)).toDF(), rules) == 0L)
    // crash window: a gated batch wrote its quarantine for commit 1, then
    // died before the live append — the quarantine dir is an orphan
    Seq(ev(9, "view", 999.0)).toDF()
      .withColumn("_violations", lit("value_cap"))
      .withColumn("_commit_id", lit(1L))
      .write.mode("overwrite")
      .parquet(s"$lake/_graft_quarantine/b1")
    // a DIFFERENT verb claims commit 1 (plain append, no gate): the
    // orphan's id is now committed, but its marker carries no #expect tag
    assert(LakeSink.appendBatch(spark, lake,
      Seq(ev(3, "view", 3.0)).toDF()) == 1L)
    val visible = LakeSink.readQuarantine(spark, lake)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(visible == Set(2L),
      "orphaned quarantine rows surfaced as rejects of an ungated commit")
    // a later GATED commit still surfaces normally
    assert(LakeSink.appendWithExpectations(spark, lake,
      Seq(ev(4, "view", 4.0), ev(5, "view", 500.0)).toDF(), rules) == 2L)
    assert(LakeSink.readQuarantine(spark, lake)
      .select("event_id").collect().map(_.getLong(0)).toSet == Set(2L, 5L))
  }
}
