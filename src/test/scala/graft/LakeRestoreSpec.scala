package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.restoreTo]]: rollback-as-a-commit over the ledgered lake —
  * O(churn) leaf selection, history preservation through the restore
  * (including wholesale-retired leaves), crash convergence at every
  * injection point, and the no-op/range guards. The oracle-checked f20 row
  * drives the full bad-deploy arc at fixture scale; this suite pins the
  * mechanics that row can't observe from its census.
  */
class LakeRestoreSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, day: Int, typ: String, v: Double) =
    Event(id, ts(f"2024-03-0$day 10:00:0${id % 10}"), 100 + id, typ, v)

  /** Commits 0 and 1: three dates, four keys per date. */
  private def layDown(lake: String): Unit = {
    import spark.implicits._
    val batch0 = Seq(
      ev(1, 1, "click", 1.0), ev(2, 1, "view", 2.0),
      ev(5, 2, "click", 5.0), ev(6, 2, "view", 6.0),
      ev(9, 3, "click", 9.0), ev(10, 3, "view", 10.0))
    val batch1 = Seq(
      ev(3, 1, "click", 3.0), ev(4, 1, "view", 4.0),
      ev(7, 2, "click", 7.0), ev(8, 2, "view", 8.0),
      ev(11, 3, "click", 11.0), ev(12, 3, "view", 12.0))
    assert(LakeSink.appendBatch(spark, lake, batch0.toDF()) == 0L)
    assert(LakeSink.appendBatch(spark, lake, batch1.toDF()) == 1L)
  }

  /** The day-1-only merge (commit 2): update id=1, delete id=3. */
  private def badMerge(lake: String): Unit = {
    import spark.implicits._
    val m = LakeSink.mergeInto(spark, lake,
      Seq(ev(1, 1, "oops", 100.0)).toDF(),
      "event_id",
      Seq(ev(3, 1, "click", 3.0)).toDF().select("event_id", "ts"))
    assert(m.commitId == 2L)
  }

  private def leafFiles(lake: String, leaf: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(lake, leaf)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSet
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  test("restore touches only changed leaves and reproduces the snapshot") {
    val lake = GraftTestSpark.tmpDir("lake_restore") + "/t"
    layDown(lake)
    badMerge(lake)
    val day2Before = leafFiles(lake, "event_date=2024-03-02")
    val day3Before = leafFiles(lake, "event_date=2024-03-03")
    val postMergeIds = ids(LakeSink.readLake(spark, lake))

    val stats = LakeSink.restoreTo(spark, lake, asOf = 1L)
    assert(stats.commitId == 3L && stats.asOf == 1L)
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-01"))
    assert(stats.retiredLeaves.isEmpty)
    // O(churn): the untouched leaves' files did not move
    assert(leafFiles(lake, "event_date=2024-03-02") == day2Before)
    assert(leafFiles(lake, "event_date=2024-03-03") == day3Before)
    // the live view is the snapshot again
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet)
    assert(LakeSink.readLake(spark, lake)
      .filter(col("event_id") === 1L).select("event_type")
      .head.getString(0) == "click")
    // history preserved THROUGH the restore: the bad era still serves
    assert(ids(LakeSink.readAsOf(spark, lake, 2L)) == postMergeIds)
    assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet)
    // ingestion continues on the restored timeline
    import spark.implicits._
    assert(LakeSink.appendBatch(spark, lake,
      Seq(ev(13, 1, "click", 13.0)).toDF()) == 4L)
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 13L).toSet)
  }

  test("restore retires born-after-snapshot leaves, still time-travelable") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_restore_retire") + "/t"
    layDown(lake)
    // commit 2: a backfill onto a brand-new date leaf
    assert(LakeSink.appendBatch(spark, lake,
      Seq(ev(50, 9, "backfill", 50.0)).toDF()) == 2L)
    val stats = LakeSink.restoreTo(spark, lake, asOf = 1L)
    assert(stats.commitId == 3L)
    assert(stats.rewrittenLeaves.isEmpty)
    assert(stats.retiredLeaves == Seq("event_date=2024-03-09"))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet)
    // the retired leaf serves history-only for the pre-restore era…
    assert(ids(LakeSink.readAsOf(spark, lake, 2L)) == (1L to 12L).toSet + 50L)
    // …and is legitimately absent both before its birth and after restore
    assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet)
    assert(ids(LakeSink.readAsOf(spark, lake, 3L)) == (1L to 12L).toSet)
  }

  test("restore-after-restore resurrects a leaf the prior restore retired") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_restore_undo") + "/t"
    layDown(lake)
    // commit 2: a backfill onto a brand-new date leaf
    assert(LakeSink.appendBatch(spark, lake,
      Seq(ev(50, 9, "backfill", 50.0)).toDF()) == 2L)
    // commit 3: roll back past the backfill — day 9 retires into history
    val first = LakeSink.restoreTo(spark, lake, asOf = 1L)
    assert(first.retiredLeaves == Seq("event_date=2024-03-09"))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet)
    // commit 4: UNDO the restore — asOf=2 covers the retired leaf, which
    // only exists in _graft_history now; the live view must resurrect it
    val undo = LakeSink.restoreTo(spark, lake, asOf = 2L)
    assert(undo.commitId == 4L)
    assert(undo.rewrittenLeaves.isEmpty && undo.retiredLeaves.isEmpty)
    assert(undo.resurrectedLeaves == Seq("event_date=2024-03-09"))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet + 50L,
      "live view diverged from readAsOf(2): the retired leaf was not resurrected")
    // every era still time-travels
    assert(ids(LakeSink.readAsOf(spark, lake, 2L)) == (1L to 12L).toSet + 50L)
    assert(ids(LakeSink.readAsOf(spark, lake, 3L)) == (1L to 12L).toSet)
    assert(ids(LakeSink.readAsOf(spark, lake, 4L)) == (1L to 12L).toSet + 50L)
    // ingestion continues on the undone timeline
    assert(LakeSink.appendBatch(spark, lake,
      Seq(ev(13, 1, "click", 13.0)).toDF()) == 5L)
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 13L).toSet + 50L)
  }

  test("restore converges through a crash at every injection point") {
    import spark.implicits._
    val points = Seq("staged", "swapped:event_date=2024-03-01",
      "retired:event_date=2024-03-09", "pre-marker")
    points.foreach { crashAt =>
      val lake = GraftTestSpark.tmpDir(s"lake_restore_crash") + "/t"
      layDown(lake)
      badMerge(lake)
      assert(LakeSink.appendBatch(spark, lake,
        Seq(ev(50, 9, "backfill", 50.0)).toDF()) == 3L)
      val boom = intercept[RuntimeException] {
        LakeSink.restoreTo(spark, lake, asOf = 1L,
          faultInjector = p => if (p == crashAt) sys.error(s"crash@$p"))
      }
      assert(boom.getMessage.contains("crash@"), s"point $crashAt never fired")
      // the crashed attempt never committed: ledger head is still 3
      val ledger = new org.apache.hadoop.fs.Path(lake, "_graft_commits")
      val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val head = fs.listStatus(ledger).toSeq
        .filter(f => f.isFile && f.getPath.getName.nonEmpty &&
          f.getPath.getName.forall(_.isDigit))
        .map(_.getPath.getName.toLong).max
      assert(head == 3L, s"point $crashAt: crashed restore left a marker")
      // the retry converges to the clean outcome
      val stats = LakeSink.restoreTo(spark, lake, asOf = 1L)
      assert(stats.commitId == 4L, s"point $crashAt: $stats")
      assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet,
        s"point $crashAt: live diverged")
      assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet,
        s"point $crashAt: snapshot 1 diverged")
      assert(ids(LakeSink.readAsOf(spark, lake, 3L)) == (1L to 12L).toSet - 3L + 50L,
        s"point $crashAt: pre-restore era diverged (post-merge state: id 1 " +
          "updated, id 3 deleted, plus the backfill)")
      assert(LakeSink.appendBatch(spark, lake,
        Seq(ev(13, 1, "click", 13.0)).toDF()) == 5L,
        s"point $crashAt: post-restore append broke")
    }
  }

  test("restore guards: no-op at head, loud out of range") {
    val lake = GraftTestSpark.tmpDir("lake_restore_guard") + "/t"
    layDown(lake)
    val noop = LakeSink.restoreTo(spark, lake, asOf = 1L)
    assert(noop.commitId == 1L && noop.rewrittenLeaves.isEmpty)
    // the no-op wrote no marker: the ledger head is still 1
    assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet)
    intercept[IllegalArgumentException] {
      LakeSink.restoreTo(spark, lake, asOf = 7L)
    }
  }
}
