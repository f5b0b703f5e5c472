package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.appendBatchOcc]]: optimistic multi-writer concurrency on the
  * ledgered lake — disjoint-leaf writers interleave (a merge job and an
  * ingest tail, two OCC tails), a conflicting pair dies loudly with its
  * own files rolled back and no committed row lost, crashed attempts are
  * reaped on retry with dedupKey exactly-once, and the exclusive epoch
  * fence still stops every OCC writer.
  */
class LakeOccSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, day: Int, typ: String, v: Double) =
    Event(id, ts(f"2024-03-0$day 10:00:0${id % 10}"), 100 + id, typ, v)

  /** Commits 0 and 1: days 1 and 2. */
  private def layDown(lake: String): Unit = {
    import spark.implicits._
    assert(LakeSink.appendBatch(spark, lake, Seq(
      ev(1, 1, "click", 1.0), ev(2, 1, "view", 2.0),
      ev(5, 2, "click", 5.0), ev(6, 2, "view", 6.0)).toDF()) == 0L)
    assert(LakeSink.appendBatch(spark, lake, Seq(
      ev(3, 1, "click", 3.0), ev(7, 2, "view", 7.0)).toDF()) == 1L)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("event_id").collect().map(_.getLong(0)).toSet

  private def leafFiles(lake: String, leaf: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(lake, leaf)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSet
  }

  test("a merge job and an OCC tail commit concurrently to disjoint leaves") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_merge") + "/t"
    layDown(lake)
    // the deployment's standing epoch: claimed once, handed to the merge
    // job — so neither writer bumps the fence out from under the other
    val epoch = LakeSink.claimWriterEpoch(spark, lake)
    // the tail stages + places day-9 rows, and BEFORE its marker lands a
    // merge job commits a day-1 update at the id the tail had allocated
    val committed = LakeSink.appendBatchOcc(spark, lake,
      Seq(ev(50, 9, "tail", 50.0)).toDF(), writerId = "tail",
      faultInjector = p => if (p == "placed") {
        val m = LakeSink.mergeInto(spark, lake,
          Seq(ev(1, 1, "edited", 100.0)).toDF(), "event_id",
          Seq(ev(3, 1, "click", 3.0)).toDF().select("event_id", "ts"),
          fenceEpoch = Some(epoch))
        assert(m.commitId == 2L, s"merge expected commit 2, got ${m.commitId}")
      })
    // the tail lost the exchange at 2, validated disjointness, retried at 3
    assert(committed == 3L)
    val got = LakeSink.readLake(spark, lake)
    assert(ids(got) == Set(1L, 2L, 5L, 6L, 7L, 50L), "rows lost under OCC")
    assert(got.filter(col("event_id") === 1L).select("event_type")
      .head.getString(0) == "edited", "the merge's update was lost")
    // the tail's files carry its final lineage + writer id
    val day9 = leafFiles(lake, "event_date=2024-03-09")
    assert(day9.nonEmpty && day9.forall(_.startsWith("gb3-wtail-")), day9.toString)
    // both eras time-travel
    assert(ids(LakeSink.readAsOf(spark, lake, 2L)) == Set(1L, 2L, 5L, 6L, 7L))
    assert(ids(LakeSink.readAsOf(spark, lake, 3L)) == Set(1L, 2L, 5L, 6L, 7L, 50L))
  }

  test("two OCC writers interleave on disjoint leaves") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_two") + "/t"
    layDown(lake)
    var bId = -1L
    val aId = LakeSink.appendBatchOcc(spark, lake,
      Seq(ev(60, 8, "a", 60.0)).toDF(), writerId = "wa",
      faultInjector = p => if (p == "placed") {
        bId = LakeSink.appendBatchOcc(spark, lake,
          Seq(ev(70, 9, "b", 70.0)).toDF(), writerId = "wb")
      })
    assert(bId == 2L && aId == 3L, s"expected b=2 a=3, got b=$bId a=$aId")
    assert(ids(LakeSink.readLake(spark, lake)) ==
      Set(1L, 2L, 3L, 5L, 6L, 7L, 60L, 70L))
  }

  test("a conflicting pair dies loudly with its files rolled back — no lost rows") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_conflict") + "/t"
    layDown(lake)
    val day1Before = leafFiles(lake, "event_date=2024-03-01")
    val boom = intercept[IllegalStateException] {
      LakeSink.appendBatchOcc(spark, lake,
        Seq(ev(80, 1, "loser", 80.0)).toDF(), writerId = "loser",
        faultInjector = p => if (p == "placed") {
          // a rival commits to the SAME day-1 leaf first
          LakeSink.appendBatchOcc(spark, lake,
            Seq(ev(90, 1, "winner", 90.0)).toDF(), writerId = "winner")
        })
    }
    assert(boom.getMessage.contains("OCC conflict"), boom.getMessage)
    assert(boom.getMessage.contains("2024-03-01"), boom.getMessage)
    // the winner's rows committed; the loser's files are gone
    assert(ids(LakeSink.readLake(spark, lake)) == Set(1L, 2L, 3L, 5L, 6L, 7L, 90L))
    val day1After = leafFiles(lake, "event_date=2024-03-01")
    assert(!day1After.exists(_.contains("-wloser-")),
      s"loser's files not rolled back: $day1After")
    assert(day1After == day1Before ++ day1After.filter(_.contains("-wwinner-")))
  }

  test("crashed attempt is reaped on retry; dedupKey is exactly-once") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_crash") + "/t"
    layDown(lake)
    // crash AFTER placement, BEFORE the marker: files visible, uncommitted
    intercept[RuntimeException] {
      LakeSink.appendBatchOcc(spark, lake,
        Seq(ev(50, 9, "tail", 50.0)).toDF(), writerId = "tail",
        dedupKey = Some("batch7"),
        faultInjector = p => if (p == "placed") sys.error("crash@placed"))
    }
    assert(leafFiles(lake, "event_date=2024-03-09").nonEmpty,
      "expected the crashed attempt's placed files (the documented window)")
    // the retry reaps the leftovers and commits exactly one copy
    val id = LakeSink.appendBatchOcc(spark, lake,
      Seq(ev(50, 9, "tail", 50.0)).toDF(), writerId = "tail",
      dedupKey = Some("batch7"))
    assert(id == 2L)
    assert(LakeSink.readLake(spark, lake)
      .filter(col("event_id") === 50L).count() == 1L, "phantom copy survived")
    // same dedupKey again: idempotent no-op returning the committed id
    assert(LakeSink.appendBatchOcc(spark, lake,
      Seq(ev(50, 9, "tail", 50.0)).toDF(), writerId = "tail",
      dedupKey = Some("batch7")) == 2L)
    assert(LakeSink.readLake(spark, lake)
      .filter(col("event_id") === 50L).count() == 1L)
  }

  test("vacuum reaps an abandoned writer's leftovers; committed OCC rows survive") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_vacuum") + "/t"
    layDown(lake)
    // commit 2: a real OCC commit — its files must survive every vacuum
    assert(LakeSink.appendBatchOcc(spark, lake,
      Seq(ev(50, 9, "tail", 50.0)).toDF(), writerId = "tail") == 2L)
    // an ABANDONED writer: placed files at the next id, no marker, never
    // returns to reap its own leftovers
    intercept[RuntimeException] {
      LakeSink.appendBatchOcc(spark, lake,
        Seq(ev(60, 8, "ghost", 60.0)).toDF(), writerId = "ghost",
        faultInjector = p => if (p == "placed") sys.error("crash@placed"))
    }
    assert(leafFiles(lake, "event_date=2024-03-08").exists(_.contains("-wghost-")))
    val ep = LakeSink.claimWriterEpoch(spark, lake)
    // grace 0: this test models a writer abandoned LONG ago (its files'
    // age is simulated, not waited out) — the in-flight protection the
    // default grace provides is pinned by the test below
    LakeSink.vacuum(spark, lake,
      before = java.time.LocalDate.of(2024, 1, 1), fenceEpoch = Some(ep),
      occReapGraceMs = 0L)
    // the orphans and the abandoned staging are gone; committed rows stand
    assert(!leafFiles(lake, "event_date=2024-03-08").exists(_.contains("-wghost-")),
      "vacuum left the abandoned writer's uncommitted files")
    assert(leafFiles(lake, "event_date=2024-03-09").exists(_.contains("-wtail-")),
      "vacuum reaped a COMMITTED OCC writer's files")
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake, "_staging/occ-ghost")))
    assert(ids(LakeSink.readLake(spark, lake)) == Set(1L, 2L, 3L, 5L, 6L, 7L, 50L))
    // the adoption hazard is closed: a later commit claiming the crashed
    // attempt's id carries none of the ghost's rows
    assert(LakeSink.appendBatch(spark, lake,
      Seq(ev(70, 1, "later", 70.0)).toDF()) == 3L)
    assert(ids(LakeSink.readLake(spark, lake)) ==
      Set(1L, 2L, 3L, 5L, 6L, 7L, 50L, 70L))
  }

  test("vacuum's OCC reaps respect the grace window: fresh artifacts survive") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_grace") + "/t"
    layDown(lake)
    // a writer crashes right after placement: its files and staging tree
    // are seconds old — indistinguishable (by the filesystem) from a LIVE
    // writer that adopted the maintenance epoch and is between staging
    // and marker commit. Default-grace vacuum must leave both alone.
    intercept[RuntimeException] {
      LakeSink.appendBatchOcc(spark, lake,
        Seq(ev(60, 8, "ghost", 60.0)).toDF(), writerId = "ghost",
        faultInjector = p => if (p == "placed") sys.error("crash@placed"))
    }
    val fs = new org.apache.hadoop.fs.Path(lake)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ep = LakeSink.claimWriterEpoch(spark, lake)
    LakeSink.vacuum(spark, lake,
      before = java.time.LocalDate.of(2024, 1, 1), fenceEpoch = Some(ep))
    assert(leafFiles(lake, "event_date=2024-03-08").exists(_.contains("-wghost-")),
      "default-grace vacuum reaped a fresh (possibly in-flight) OCC placement")
    assert(fs.exists(new org.apache.hadoop.fs.Path(lake, "_staging/occ-ghost")),
      "default-grace vacuum reaped a fresh (possibly in-flight) OCC staging tree")
    // aged out (grace 0 models mtime < horizon): the same artifacts reap
    val ep2 = LakeSink.claimWriterEpoch(spark, lake)
    LakeSink.vacuum(spark, lake,
      before = java.time.LocalDate.of(2024, 1, 1), fenceEpoch = Some(ep2),
      occReapGraceMs = 0L)
    assert(!leafFiles(lake, "event_date=2024-03-08").exists(_.contains("-wghost-")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake, "_staging/occ-ghost")))
    assert(ids(LakeSink.readLake(spark, lake)) == Set(1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("an exclusive epoch claim fences OCC writers out, files rolled back") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_occ_fence") + "/t"
    layDown(lake)
    val boom = intercept[IllegalStateException] {
      LakeSink.appendBatchOcc(spark, lake,
        Seq(ev(50, 9, "tail", 50.0)).toDF(), writerId = "tail",
        faultInjector = p =>
          if (p == "placed") LakeSink.claimWriterEpoch(spark, lake))
    }
    assert(boom.getMessage.contains("fenced"), boom.getMessage)
    assert(leafFiles(lake, "event_date=2024-03-09").isEmpty,
      "fenced OCC writer must roll its files back")
    assert(ids(LakeSink.readLake(spark, lake)) == Set(1L, 2L, 3L, 5L, 6L, 7L))
  }
}
