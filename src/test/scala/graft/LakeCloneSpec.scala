package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink
import graft.streaming.StatefulOps.Event

/** [[LakeSink.cloneTable]]/[[LakeSink.cloneMerge]] + the overlay read:
  * pin isolation, CoW shadow crash-ordering, the guarded verb surface,
  * and the source-vacuum breakage caveat. The oracle-checked f21 row
  * drives the mixed overlay census; this suite pins the mechanics.
  */
class LakeCloneSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, day: Int, typ: String, v: Double) =
    Event(id, ts(f"2024-03-0$day 10:00:0${id % 10}"), 100 + id, typ, v)

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

  test("clone pins the snapshot; source divergence is invisible; writes stay local") {
    import spark.implicits._
    val dir = GraftTestSpark.tmpDir("lake_clone")
    val (src, cln) = (dir + "/src", dir + "/cln")
    layDown(src)
    assert(LakeSink.cloneTable(spark, src, cln) == 1L)
    // source diverges after the pin
    assert(LakeSink.appendBatch(spark, src,
      Seq(ev(9, 3, "late", 9.0)).toDF()) == 2L)
    assert(ids(LakeSink.readLake(spark, cln)) == Set(1L, 2L, 3L, 5L, 6L, 7L))
    // clone-local append: visible in the clone, never in the source
    assert(LakeSink.appendBatch(spark, cln,
      Seq(ev(20, 1, "local", 20.0)).toDF()) == 0L)
    assert(ids(LakeSink.readLake(spark, cln)) == Set(1L, 2L, 3L, 5L, 6L, 7L, 20L))
    assert(ids(LakeSink.readLake(spark, src)) == Set(1L, 2L, 3L, 5L, 6L, 7L, 9L))
  }

  test("cloneMerge CoWs only touched leaves; merge semantics hold; source untouched") {
    import spark.implicits._
    val dir = GraftTestSpark.tmpDir("lake_clone_cow")
    val (src, cln) = (dir + "/src", dir + "/cln")
    layDown(src)
    LakeSink.cloneTable(spark, src, cln)
    val stats = LakeSink.cloneMerge(spark, cln,
      Seq(ev(1, 1, "edited", 100.0)).toDF(), "event_id",
      Seq(ev(3, 1, "click", 3.0)).toDF().select("event_id", "ts"))
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-01"))
    val got = LakeSink.readLake(spark, cln)
    assert(ids(got) == Set(1L, 2L, 5L, 6L, 7L))
    assert(got.filter(col("event_id") === 1L).select("event_type")
      .head.getString(0) == "edited")
    // day 2 still serves straight from the source (no local leaf for it)
    val fs = new org.apache.hadoop.fs.Path(cln)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(cln, "event_date=2024-03-02")))
    assert(ids(LakeSink.readLake(spark, src)) == Set(1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("an inert shadow marker (crash before CoW commit) cannot hide source rows") {
    import spark.implicits._
    val dir = GraftTestSpark.tmpDir("lake_clone_inert")
    val (src, cln) = (dir + "/src", dir + "/cln")
    layDown(src)
    LakeSink.cloneTable(spark, src, cln)
    // simulate the crash window: marker written, claimed CoW commit absent
    val fs = new org.apache.hadoop.fs.Path(cln)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(cln, "_graft_shadow"))
    val m = new org.apache.hadoop.fs.Path(cln, "_graft_shadow/event_date=2024-03-01")
    val out = fs.create(m, true)
    out.write("0".getBytes("UTF-8")); out.close()
    // commit 0 does not exist locally -> the marker is inert, rows serve
    assert(ids(LakeSink.readLake(spark, cln)) == Set(1L, 2L, 3L, 5L, 6L, 7L))
    // a PLAIN local append claims the referenced id: its marker is NOT
    // #cow-tagged, so the stale shadow must stay inert — the crash-window
    // that would otherwise silently drop every source row for the date
    assert(LakeSink.appendBatch(spark, cln,
      Seq(ev(20, 1, "local", 20.0)).toDF(), commitId = Some(0L)) == 0L)
    val got = LakeSink.readLake(spark, cln)
    assert(ids(got) == Set(1L, 2L, 3L, 5L, 6L, 7L, 20L),
      "stale shadow marker activated by an unrelated commit")
    assert(got.filter(col("event_id") === 1L).count() == 1L)
    // the real cloneMerge retry rewrites the markers to ITS tagged CoW
    // commit — only then do they become effective
    val stats = LakeSink.cloneMerge(spark, cln,
      Seq(ev(1, 1, "edited", 100.0)).toDF(), "event_id",
      Seq(ev(3, 1, "click", 3.0)).toDF().select("event_id", "ts"))
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-01"))
    val after = LakeSink.readLake(spark, cln)
    assert(ids(after) == Set(1L, 2L, 5L, 6L, 7L, 20L))
    assert(after.filter(col("event_id") === 1L).select("event_type")
      .head.getString(0) == "edited")
    // the shadowed leaf serves from the clone ONLY: no double-serving
    assert(after.filter(col("event_id") === 2L).count() == 1L)
  }

  test("unsupported verbs fail loudly on a clone") {
    import spark.implicits._
    val dir = GraftTestSpark.tmpDir("lake_clone_guard")
    val (src, cln) = (dir + "/src", dir + "/cln")
    layDown(src)
    LakeSink.cloneTable(spark, src, cln)
    def loud(f: => Any): Unit = {
      val e = intercept[IllegalArgumentException](f)
      assert(e.getMessage.contains("unsupported on a shallow clone"), e.getMessage)
    }
    loud(LakeSink.readAsOf(spark, cln, 0L))
    loud(LakeSink.restoreTo(spark, cln, 0L))
    loud(LakeSink.mergeInto(spark, cln,
      Seq(ev(1, 1, "x", 1.0)).toDF(), "event_id",
      Seq.empty[Event].toDF().select("event_id", "ts")))
    loud(LakeSink.deleteVectors(spark, cln,
      Seq(ev(1, 1, "x", 1.0)).toDF().select("event_id", "ts"), "event_id"))
    loud(LakeSink.purgeKeys(spark, cln,
      Seq(ev(1, 1, "x", 1.0)).toDF().select("user_id"), "user_id"))
    loud(LakeSink.compactPartitions(spark, cln, 1L << 20, 2))
    loud(LakeSink.vacuum(spark, cln, java.time.LocalDate.now()))
    // cloning a clone is refused too
    intercept[IllegalArgumentException](LakeSink.cloneTable(spark, cln, dir + "/c2"))
  }

  test("vacuuming the source past the pin breaks the clone LOUDLY") {
    import spark.implicits._
    val dir = GraftTestSpark.tmpDir("lake_clone_vac")
    val (src, cln) = (dir + "/src", dir + "/cln")
    layDown(src)
    LakeSink.cloneTable(spark, src, cln) // pinned at 1
    // source merge (commit 2) rewrites day 1 beyond the pin; the clone
    // keeps reading via the retained pre-merge generation
    LakeSink.mergeInto(spark, src,
      Seq(ev(1, 1, "rewritten", 50.0)).toDF(), "event_id",
      Seq.empty[Event].toDF().select("event_id", "ts"))
    assert(LakeSink.readLake(spark, cln)
      .filter(col("event_id") === 1L).select("event_type")
      .head.getString(0) == "click")
    // vacuum prunes the retained generation (ledgerKeep = -1 forces the
    // horizon) while keeping the live data -> the Delta shallow-clone caveat
    LakeSink.vacuum(spark, src, java.time.LocalDate.parse("2024-01-01"),
      ledgerKeep = -1L)
    val e = intercept[IllegalStateException](LakeSink.readLake(spark, cln).count())
    assert(e.getMessage.contains("time travel"), e.getMessage)
  }
}
