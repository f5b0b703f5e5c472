package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.purgeKeys]]: GDPR physical erasure — purged keys leave the
  * live view, the retained history (with time travel into the erased window
  * failing LOUDLY, never part-serving), and the change feed; untouched
  * leaves stay byte-identical; deletion vectors materialize through the
  * rewrite; crash-retry converges.
  */
class LakePurgeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Three dates x four keys per date, two appends; user_id = 100 + id. */
  private def layDown(lake: String): Unit = {
    import spark.implicits._
    def ev(id: Long, day: Int, typ: String, v: Double) =
      Event(id, ts(f"2024-03-0$day 10:00:0${id % 10}"), 100 + id, typ, v)
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

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  private def users(keys: Long*) = {
    import spark.implicits._
    keys.toDF("user_id")
  }

  private def leafFiles(lake: String, leaf: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(lake, leaf)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSet
  }

  test("purge removes the keys from live; untouched leaves byte-identical") {
    val lake = GraftTestSpark.tmpDir("lake_purge") + "/t"
    layDown(lake)
    val day3Before = leafFiles(lake, "event_date=2024-03-03")

    // users 105 and 106 live on day 2 only
    val stats = LakeSink.purgeKeys(spark, lake, users(105L, 106L), "user_id")
    assert(stats.commitId == 2L && stats.purgedRows == 2L)
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-02"))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet -- Set(5L, 6L))
    // the rewrite is gc-stamped with the purge commit; untouched leaves
    // keep their exact files
    assert(leafFiles(lake, "event_date=2024-03-02").forall(_.startsWith("gc2-")))
    assert(leafFiles(lake, "event_date=2024-03-03") == day3Before)
    // purging a key that no longer exists is an effect-free no-op
    val again = LakeSink.purgeKeys(spark, lake, users(105L), "user_id")
    assert(again.commitId == -1L && again.purgedRows == 0L)
  }

  test("history is erased: pre-purge snapshots fail LOUDLY, post-purge serve clean") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_purge_hist") + "/t"
    layDown(lake)
    // merge commit 2 rewrites day 1 (update id=1) -> pre-merge day-1 state
    // retained under _graft_history/2/
    val upserts = Seq(Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    assert(LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes).commitId == 2L)
    // snapshot at 1 serves the pre-merge day-1 from history
    assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet)

    // purge user 102 (id=2, day 1): live day-1 rewritten AND the history
    // generation's day-1 leaf destroyed
    val stats = LakeSink.purgeKeys(spark, lake, users(102L), "user_id")
    assert(stats.commitId == 3L && stats.historyLeavesDropped == 1)
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet - 2L)
    val e = intercept[IllegalStateException] {
      LakeSink.readAsOf(spark, lake, 1L).collect()
    }
    assert(e.getMessage.contains("time travel"), s"wrong failure: ${e.getMessage}")
    // the purge commit itself is a servable snapshot, purged key absent
    assert(ids(LakeSink.readAsOf(spark, lake, 3L)) == (1L to 12L).toSet - 2L)
  }

  test("change records are rewritten: the feed forgets the purged key, keeps the rest") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_purge_cdc") + "/t"
    layDown(lake)
    val upserts = Seq(
      Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0),
      Event(2, ts("2024-03-01 10:00:02"), 102, "updated", 200.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val merged = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes,
      recordChanges = true)

    val stats = LakeSink.purgeKeys(spark, lake, users(101L), "user_id")
    assert(stats.cdcRecordsRewritten == 1)
    val feed = LakeSink.tailChanges(spark, lake, merged.commitId - 1, merged.commitId)
    assert(feed.filter(col("user_id") === 101L).isEmpty,
      "the change feed must forget the purged key's pre/post images")
    // the other key's update survives intact
    assert(feed.filter(col("user_id") === 102L).count() == 2L) // pre + post
  }

  test("purge materializes deletion vectors in the leaves it rewrites") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_purge_dv") + "/t"
    layDown(lake)
    // DV-delete id=5 (day 2), then purge user 106 (id=6, same leaf)
    LakeSink.deleteVectors(spark, lake,
      Seq((5L, ts("2024-03-02 10:00:05"))).toDF("event_id", "ts"), "event_id")
    LakeSink.purgeKeys(spark, lake, users(106L), "user_id")
    // the bare parquet read (no DV logic) must show NEITHER: 5's bytes left
    // with the rewrite, 6's were purged
    assert(ids(spark.read.parquet(lake)) == (1L to 12L).toSet -- Set(5L, 6L))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet -- Set(5L, 6L))
  }

  test("crash mid-purge: the retry converges to one clean commit") {
    val lake = GraftTestSpark.tmpDir("lake_purge_crash") + "/t"
    layDown(lake)
    final class Boom extends RuntimeException("injected crash")
    // users 101 (day 1) and 105 (day 2): crash after the FIRST leaf swap
    intercept[Boom] {
      LakeSink.purgeKeys(spark, lake, users(101L, 105L), "user_id",
        faultInjector = p => if (p.startsWith("rewritten:")) throw new Boom)
    }
    val retry = LakeSink.purgeKeys(spark, lake, users(101L, 105L), "user_id")
    assert(retry.commitId == 2L)
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet -- Set(1L, 5L))
    // exactly one marker landed
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake, "_graft_commits/3")))
  }

  test("a stale writer epoch cannot purge") {
    val lake = GraftTestSpark.tmpDir("lake_purge_fence") + "/t"
    layDown(lake)
    val stale = LakeSink.claimWriterEpoch(spark, lake)
    LakeSink.claimWriterEpoch(spark, lake) // successor fences it out
    val e = intercept[IllegalStateException] {
      LakeSink.purgeKeys(spark, lake, users(101L), "user_id",
        fenceEpoch = Some(stale))
    }
    assert(e.getMessage.contains("fenced"))
  }
}
