package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.deleteVectors]]: merge-on-read deletes (the Delta
  * deletion-vector shape from FS primitives) — an O(churn) sidecar instead
  * of a copy-on-write leaf rewrite, anti-applied by every lake read path,
  * materialized by compaction, never resurrected by a later merge, atomic
  * under crash-retry, and reclaimed by vacuum only once provably dead.
  */
class LakeDvSpec extends AnyFunSuite {
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

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  private def dataFiles(lake: String): Map[String, Set[String]] = {
    val root = new org.apache.hadoop.fs.Path(lake)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
      .map { l =>
        l.getPath.getName -> fs.listStatus(l.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.getName).toSet
      }.toMap
  }

  private def del(id: Long, day: Int) = (id, ts(f"2024-03-0$day 10:00:0${id % 10}"))

  test("merge-on-read: delete hides rows from every read path, moves NO data files") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_dv") + "/t"
    layDown(lake)
    val before = dataFiles(lake)

    val stats = LakeSink.deleteVectors(spark, lake,
      Seq(del(5, 2), del(10, 3)).toDF("event_id", "ts"), "event_id")
    assert(stats.commitId == 2L)
    assert(stats.deletedRows == 2L)
    assert(stats.touchedLeaves == Seq("event_date=2024-03-02", "event_date=2024-03-03"))

    // the merge-on-read claim: the data layout is BYTE-IDENTICAL — no leaf
    // was rewritten, no file moved; only the sidecar + marker landed
    assert(dataFiles(lake) == before)

    val want = (1L to 12L).toSet -- Set(5L, 10L)
    assert(ids(LakeSink.readLake(spark, lake)) == want)
    // pruned read path applies DVs too (day 2..3 ids live in the id range)
    val (pruned, _) = LakeSink.readPruned(spark, lake, "event_id",
      BigDecimal(1), BigDecimal(12))
    assert(ids(pruned) == want)

    // time travel: before the delete commit the rows are visible; at it, gone
    assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet)
    assert(ids(LakeSink.readAsOf(spark, lake, 2L)) == want)

    // re-delete of an already-deleted key is a committed no-op (no double
    // entry, no burned commit)
    val again = LakeSink.deleteVectors(spark, lake,
      Seq(del(5, 2)).toDF("event_id", "ts"), "event_id")
    assert(again.commitId == -1L && again.deletedRows == 0L)
    assert(ids(LakeSink.readLake(spark, lake)) == want)
  }

  test("compaction materializes: census unchanged, sidecar stops matching, history snapshots still serve") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_dv_mat") + "/t"
    layDown(lake)
    LakeSink.deleteVectors(spark, lake,
      Seq(del(1, 1), del(6, 2)).toDF("event_id", "ts"), "event_id")
    val want = (1L to 12L).toSet -- Set(1L, 6L)

    val swept = LakeSink.compactPartitions(spark, lake,
      targetFileBytes = 512L << 10, minFiles = 2)
    assert(swept.nonEmpty, "fixture leaves hold 2 files each — sweep must rewrite")
    // live view identical after materialization, via BOTH the DV-aware
    // reader and a bare parquet read (the rewrite itself dropped the rows)
    assert(ids(LakeSink.readLake(spark, lake)) == want)
    assert(ids(spark.read.parquet(lake)) == want)
    // snapshots across the delete still serve from retained history WITH
    // the right DV view: pre-delete shows the rows, post-delete hides them
    assert(ids(LakeSink.readAsOf(spark, lake, 1L)) == (1L to 12L).toSet)
    assert(ids(LakeSink.readAsOf(spark, lake, 2L)) == want)
  }

  test("a later merge does not resurrect DV-deleted rows") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_dv_merge") + "/t"
    layDown(lake)
    LakeSink.deleteVectors(spark, lake,
      Seq(del(2, 1)).toDF("event_id", "ts"), "event_id")
    // merge touches day 1 (update id=3): the copy-on-write rewrite must
    // materialize id=2's delete, not resurrect it
    val upserts = Seq(Event(3, ts("2024-03-01 10:00:03"), 103, "updated", 30.0)).toDF()
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-01"))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet - 2L)
    assert(ids(spark.read.parquet(lake)).intersect(Set(2L)).isEmpty)
  }

  test("crash before the marker: nothing applies; the retry commits the first attempt's sidecar") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_dv_crash") + "/t"
    layDown(lake)
    final class Boom extends RuntimeException("injected crash")
    intercept[Boom] {
      LakeSink.deleteVectors(spark, lake,
        Seq(del(9, 3)).toDF("event_id", "ts"), "event_id",
        faultInjector = p => if (p == "dv-written") throw new Boom)
    }
    // sidecar renamed in, marker absent -> INVISIBLE (atomicity): all rows
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet)
    // retry: same id re-allocated, generation reused, commit completes
    val stats = LakeSink.deleteVectors(spark, lake,
      Seq(del(9, 3)).toDF("event_id", "ts"), "event_id")
    assert(stats.commitId == 2L && stats.deletedRows == 1L)
    assert(stats.touchedLeaves == Seq("event_date=2024-03-03"))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet - 9L)
  }

  test("tailCommits refuses a DV commit; tailChanges serves its recorded pre-images") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_dv_tail") + "/t"
    layDown(lake)
    val stats = LakeSink.deleteVectors(spark, lake,
      Seq(del(4, 1), del(8, 2)).toDF("event_id", "ts"), "event_id",
      recordChanges = true)

    val e = intercept[IllegalStateException] {
      LakeSink.tailCommits(spark, lake, 1L, stats.commitId).collect()
    }
    assert(e.getMessage.contains("DELETION-VECTOR"))

    val chg = LakeSink.tailChanges(spark, lake, 1L, stats.commitId)
      .select("_op", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(chg == Set(("delete", 4L, 4.0), ("delete", 8L, 8.0)))
  }

  test("vacuum keeps load-bearing generations, reclaims them once materialized and history-pruned") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_dv_vac") + "/t"
    layDown(lake)
    LakeSink.deleteVectors(spark, lake,
      Seq(del(12, 3)).toDF("event_id", "ts"), "event_id")
    val root = new org.apache.hadoop.fs.Path(lake)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = new org.apache.hadoop.fs.Path(root, "_graft_dv/2")
    assert(fs.exists(gen))

    // vacuum while the targets are LIVE: the generation must survive (it is
    // the only thing keeping id=12 deleted)
    LakeSink.vacuum(spark, lake, java.time.LocalDate.parse("2024-01-01"))
    assert(fs.exists(gen))
    assert(ids(LakeSink.readLake(spark, lake)) == (1L to 12L).toSet - 12L)

    // materialize (targets leave the live leaves for history), then pad the
    // ledger head and vacuum with ledgerKeep=0: history drops, targets are
    // dead everywhere -> the generation is reclaimed
    LakeSink.compactPartitions(spark, lake, targetFileBytes = 512L << 10, minFiles = 2)
    assert(fs.exists(gen), "history still holds the targets — must survive")
    (3L to 5L).foreach { i =>
      LakeSink.appendBatch(spark, lake,
        Seq(Event(100 + i, ts("2024-03-05 10:00:00"), 200, "pad", 0.0)).toDF(),
        commitId = Some(i))
    }
    LakeSink.vacuum(spark, lake, java.time.LocalDate.parse("2024-01-01"), ledgerKeep = 0L)
    assert(!fs.exists(gen), "materialized + history-pruned generation is dead weight")
    assert(ids(LakeSink.readLake(spark, lake)) ==
      ((1L to 12L).toSet - 12L) ++ Set(103L, 104L, 105L))
  }
}
