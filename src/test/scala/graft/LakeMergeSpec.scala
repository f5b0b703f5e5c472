package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.mergeInto]] + [[LakeSink.appendBatch]]: the copy-on-write
  * upsert/delete verb over the ledgered lake — scoped rewrites, time travel
  * across a merge, idempotent crash retry, fencing, and the incremental
  * tail's loud boundary at a rewrite commit.
  */
class LakeMergeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Three dates x four keys per date, two appends (lake commits 0 and 1). */
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

  private def census(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Double)] =
    df.groupBy(col("event_date").cast("string"), col("event_type"))
      .agg(count(lit(1)), round(sum(col("value")), 2))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("merge: scoped copy-on-write + inserts + deletes, exact result") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge") + "/t"
    layDown(lake)

    // update id=1 (day 1), delete id=5 (day 2), insert id=20 into existing
    // day 3 (no matches there) and id=21 into a brand-new day 4
    val upserts = Seq(
      Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0),
      Event(20, ts("2024-03-03 12:00:00"), 120, "inserted", 20.0),
      Event(21, ts("2024-03-04 12:00:00"), 121, "inserted", 21.0)).toDF()
    val deletes = Seq((5L, ts("2024-03-02 10:00:05"))).toDF("event_id", "ts")

    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)
    assert(stats.commitId == 2L)
    // day 1 (update) and day 2 (delete) matched -> rewritten; day 3 and the
    // new day 4 are insert-only -> appended
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-01", "event_date=2024-03-02"))
    assert(stats.appendedLeaves.toSet ==
      Set("event_date=2024-03-03", "event_date=2024-03-04"))

    val got = census(spark.read.parquet(lake))
    assert(got == Map(
      ("2024-03-01", "click") -> (1L, 3.0),           // id 3 only (1 updated away)
      ("2024-03-01", "view") -> (2L, 6.0),            // ids 2, 4
      ("2024-03-01", "updated") -> (1L, 100.0),       // id 1's new version
      ("2024-03-02", "click") -> (1L, 7.0),           // id 7 (5 deleted)
      ("2024-03-02", "view") -> (2L, 14.0),           // ids 6, 8
      ("2024-03-03", "click") -> (2L, 20.0),          // ids 9, 11
      ("2024-03-03", "view") -> (2L, 22.0),           // ids 10, 12
      ("2024-03-03", "inserted") -> (1L, 20.0),       // id 20
      ("2024-03-04", "inserted") -> (1L, 21.0)))      // id 21

    // exactly-once on the key level: updated key appears once, deleted never
    val byId = spark.read.parquet(lake).groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 1L && byId.get(5L).isEmpty && byId(20L) == 1L)
  }

  test("merge: time travel serves the pre-merge snapshot from history") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge_tt") + "/t"
    layDown(lake)
    val pre = census(LakeSink.readAsOf(spark, lake, 1L))

    val upserts = Seq(Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0)).toDF()
    val deletes = Seq((5L, ts("2024-03-02 10:00:05"))).toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)

    // as-of the merge commit sees merged content; as-of 1 still the original
    val postTT = census(LakeSink.readAsOf(spark, lake, stats.commitId))
    assert(postTT == census(spark.read.parquet(lake)))
    assert(census(LakeSink.readAsOf(spark, lake, 1L)) == pre,
      "pre-merge snapshot must be served from the retained generation")
    assert(postTT != pre)
  }

  test("merge: untouched leaves are byte-untouched; insert-only leaves take gb appends") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge_scope") + "/t"
    layDown(lake)
    val root = new org.apache.hadoop.fs.Path(lake)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafFiles(name: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(root, name)
      fs.listStatus(p).filter(_.isFile)
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    }
    val day3Before = leafFiles("event_date=2024-03-03")

    // matches only in day 1; day 3 gets a pure insert; day 2 untouched
    val day2Before = leafFiles("event_date=2024-03-02")
    val upserts = Seq(
      Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0),
      Event(20, ts("2024-03-03 12:00:00"), 120, "inserted", 20.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)

    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-01"))
    assert(stats.appendedLeaves == Seq("event_date=2024-03-03"))
    assert(leafFiles("event_date=2024-03-02") == day2Before,
      "a leaf with no matches and no inserts must not be touched")
    val day3After = leafFiles("event_date=2024-03-03")
    assert(day3Before.forall { case (n, m) => day3After.get(n).contains(m) },
      "insert-only leaf must keep its existing files byte-untouched")
    assert((day3After.keySet -- day3Before.keySet).forall(_.startsWith(s"gb${stats.commitId}-")),
      "insert-only leaf must take plain gb appends, not a rewrite")
    assert(!leafFiles("event_date=2024-03-01").keySet.exists(_.startsWith("gb")),
      "a rewritten leaf holds only the gc-stamped rewrite")
  }

  test("merge: crash mid-merge, retry converges on the same commit") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge_crash") + "/t"
    layDown(lake)
    val upserts = Seq(
      Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0),
      Event(5, ts("2024-03-02 10:00:05"), 105, "updated", 500.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")

    // crash after the FIRST leaf's swap: one leaf merged, one not, no marker
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val boom = intercept[Exception] {
      LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes,
        maxConcurrency = 1,
        faultInjector = p =>
          if (p == "rewritten:event_date=2024-03-01" && fired.compareAndSet(false, true))
            throw new RuntimeException(s"injected merge crash at $p"))
    }
    assert(boom.getMessage.contains("injected merge crash") ||
      String.valueOf(boom.getCause).contains("injected merge crash"))
    val ledger = new org.apache.hadoop.fs.Path(lake, "_graft_commits/2")
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(ledger), "crashed merge must not have committed")

    // retry: same commit id re-allocated, result exactly the clean merge
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)
    assert(stats.commitId == 2L)
    assert(fs.exists(ledger))
    val got = census(spark.read.parquet(lake))
    assert(got(("2024-03-01", "updated")) == (1L, 100.0))
    assert(got(("2024-03-02", "updated")) == (1L, 500.0))
    assert(got.get(("2024-03-01", "click")).exists(_._1 == 1L)) // id 3 remains
    val byId = spark.read.parquet(lake).groupBy("event_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.values.forall(_ == 1L), s"retry duplicated a key: $byId")
    // and time travel to the pre-merge head still works after the messy retry
    assert(census(LakeSink.readAsOf(spark, lake, 1L)).contains(("2024-03-01", "click")))
  }

  test("merge: a newer writer epoch fences the merge out") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge_fence") + "/t"
    layDown(lake)
    val stale = LakeSink.claimWriterEpoch(spark, lake)
    LakeSink.claimWriterEpoch(spark, lake) // successor claims the lake
    val upserts = Seq(Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val e = intercept[IllegalStateException] {
      LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes,
        fenceEpoch = Some(stale))
    }
    assert(e.getMessage.contains("writer fenced"))
  }

  test("incremental tail refuses a merge commit loudly, append commits still serve") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge_tail") + "/t"
    layDown(lake)
    val upserts = Seq(Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)

    // the append range below the merge still tails exactly
    assert(LakeSink.tailCommits(spark, lake, -1L, 1L).count() == 12L)
    // a range crossing the merge commit names the boundary, not "data loss"
    val e = intercept[IllegalStateException] {
      LakeSink.tailCommits(spark, lake, 1L, stats.commitId).count()
    }
    assert(e.getMessage.contains("REWRITE commit"))
    assert(e.getMessage.contains(s"readAsOf(${stats.commitId})"))

    // the documented resume path: snapshot at the merge, tail appends above
    val snap = LakeSink.readAsOf(spark, lake, stats.commitId)
    assert(snap.count() == 12L)
    val id = LakeSink.appendBatch(spark, lake,
      Seq(Event(30, ts("2024-03-05 09:00:00"), 130, "click", 30.0)).toDF())
    assert(LakeSink.tailCommits(spark, lake, stats.commitId, id).count() == 1L)
  }

  test("change feed: appends as inserts, merge as recorded row-level changes") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_cdf") + "/t"
    layDown(lake)
    val upserts = Seq(
      Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0),
      Event(20, ts("2024-03-03 12:00:00"), 120, "inserted", 20.0)).toDF()
    val deletes = Seq((5L, ts("2024-03-02 10:00:05"))).toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes,
      recordChanges = true)

    val feed = LakeSink.tailChanges(spark, lake, -1L, stats.commitId)
      .select(col("_commit"), col("_op"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // appends: 12 inserts across commits 0 and 1
    assert(feed.count(c => c._1 <= 1 && c._2 == "insert") == 12)
    // merge commit: the exact four change classes
    val m = feed.filter(_._1 == stats.commitId).map(c => (c._2, c._3, c._4)).toSet
    assert(m == Set(
      ("update_pre", 1L, 1.0), ("update_post", 1L, 100.0),
      ("delete", 5L, 5.0), ("insert", 20L, 20.0)), s"merge changes: $m")
  }

  test("change feed: crash after the record, retry keeps TRUE pre-images") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_cdf_crash") + "/t"
    layDown(lake)
    val upserts = Seq(Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    // crash AFTER the change record and the first leaf swap: a naive retry
    // would recompute pre-images from the already-merged leaf (value 100)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[Exception] {
      LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes,
        maxConcurrency = 1, recordChanges = true,
        faultInjector = p =>
          if (p.startsWith("rewritten:") && fired.compareAndSet(false, true))
            throw new RuntimeException("injected post-record crash"))
    }
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes,
      recordChanges = true)
    val pre = LakeSink.tailChanges(spark, lake, stats.commitId - 1, stats.commitId)
      .filter(col("_op") === "update_pre").select("value").collect()
    assert(pre.map(_.getDouble(0)).toSeq == Seq(1.0),
      "retry must keep the first attempt's pre-image, not the merged value")
  }

  test("change feed: a merge without a change record fails loudly") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_cdf_none") + "/t"
    layDown(lake)
    val upserts = Seq(Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)
    val e = intercept[IllegalStateException] {
      LakeSink.tailChanges(spark, lake, -1L, stats.commitId).count()
    }
    assert(e.getMessage.contains("NO change record"))
    assert(e.getMessage.contains(s"readAsOf(${stats.commitId})"))
  }

  test("merge: duplicate source keys in one partition fail loudly") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_merge_dup") + "/t"
    layDown(lake)
    val dup = Seq(
      Event(1, ts("2024-03-01 10:00:01"), 101, "updated", 100.0),
      Event(1, ts("2024-03-01 11:00:00"), 101, "updated", 200.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException] {
      LakeSink.mergeInto(spark, lake, dup, "event_id", deletes)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("appendBatch: caller-claimed commit ids are exactly-once; gaps fail loudly") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_append_hwm") + "/t"
    val rows = Seq(Event(1, ts("2024-03-01 10:00:00"), 101, "click", 1.0)).toDF()
    assert(LakeSink.appendBatch(spark, lake, rows, commitId = Some(0L)) == 0L)
    // idempotent retry of the same claimed id: no-op
    assert(LakeSink.appendBatch(spark, lake, rows, commitId = Some(0L)) == 0L)
    assert(spark.read.parquet(lake).count() == 1L)
    // a stale high-water mark cannot commit out of order
    val e = intercept[IllegalArgumentException] {
      LakeSink.appendBatch(spark, lake, rows, commitId = Some(5L))
    }
    assert(e.getMessage.contains("out of order"))
  }
}
