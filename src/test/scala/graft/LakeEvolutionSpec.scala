package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LakeSink

/** The lake SCHEMA REGISTRY (`_graft_commits/_schema.<B>` — the Delta
  * schema-in-log discipline): widened appends register a union schema,
  * readers DECLARE it instead of sweeping footers, legacy files null-fill,
  * time travel picks the schema AS OF its snapshot, and narrowing fails
  * loudly.
  */
class LakeEvolutionSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Commits 0-1 carry the 5-col schema, commits 2-3 add `quality INT` —
    * and commit 2 lands in the SAME date leaves as 0-1, so single leaves
    * hold files from both sides of the widening.
    */
  private def layDown(lake: String): Long = {
    import spark.implicits._
    def ev(id: Long, day: Int) = graft.streaming.StatefulOps.Event(
      id, ts(s"2024-03-0$day 10:00:${10 + id % 40}"), 100 + id,
      if (id % 3 == 0) "click" else "view", id.toDouble)
    val old0 = (0L until 10L).map(i => ev(i, 1 + (i % 2).toInt))
    val old1 = (10L until 20L).map(i => ev(i, 1 + (i % 2).toInt))
    assert(LakeSink.appendBatch(spark, lake, old0.toDF().coalesce(1)) == 0L)
    assert(LakeSink.appendBatch(spark, lake, old1.toDF().coalesce(1)) == 1L)
    val wide2 = (20L until 30L).map(i => ev(i, 1 + (i % 2).toInt)).toDF()
      .withColumn("quality", pmod(col("event_id"), lit(5)).cast("int"))
    val wide3 = (30L until 40L).map(i => ev(i, 3)).toDF()
      .withColumn("quality", pmod(col("event_id"), lit(5)).cast("int"))
    assert(LakeSink.appendBatch(spark, lake, wide2.coalesce(1)) == 2L)
    LakeSink.appendBatch(spark, lake, wide3.coalesce(1))
  }

  test("widened append: declared union read, legacy rows null-fill") {
    val lake = GraftTestSpark.tmpDir("lake_evo") + "/t"
    layDown(lake)
    val back = LakeSink.readLake(spark, lake)
    assert(back.columns.contains("quality"), "union schema must surface the new column")
    assert(back.count() == 40L)
    val legacy = back.filter(col("quality").isNull)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(legacy == (0L until 20L).toSet, "exactly the pre-widening rows null-fill")
    assert(back.filter(col("quality") === 2)
      .select("event_id").collect().map(_.getLong(0)).toSet ==
      (20L until 40L).filter(_ % 5 == 2).toSet)
    // the hazard the registry removes: a bare read infers ONE footer's
    // schema and may drop the late column silently — the declared read
    // is the contract
    val bare = spark.read.parquet(lake)
    assert(bare.count() == 40L) // rows never at risk, only columns
  }

  test("time travel: a pre-evolution snapshot has the OLD schema") {
    val lake = GraftTestSpark.tmpDir("lake_evo_tt") + "/t"
    val last = layDown(lake)
    val pre = LakeSink.readAsOf(spark, lake, 1L)
    assert(!pre.columns.contains("quality"),
      s"snapshot at 1 must predate the widening, got ${pre.columns.mkString(",")}")
    assert(pre.count() == 20L)
    val post = LakeSink.readAsOf(spark, lake, last)
    assert(post.columns.contains("quality"))
    assert(post.count() == 40L)
    assert(post.filter(col("quality").isNull).count() == 20L)
  }

  test("incremental tail across the widening serves the union with nulls") {
    val lake = GraftTestSpark.tmpDir("lake_evo_tail") + "/t"
    layDown(lake)
    val range = LakeSink.tailCommits(spark, lake, 0L, 2L) // old commit 1 + wide commit 2
    assert(range.columns.contains("quality"))
    assert(range.count() == 20L)
    assert(range.filter(col("quality").isNull).count() == 10L,
      "commit 1's rows null-fill under the range-head schema")
    // a pre-widening range stays old-schema
    assert(!LakeSink.tailCommits(spark, lake, -1L, 1L).columns.contains("quality"))
  }

  test("narrowing or retyping fails loudly; merge reads the union schema") {
    import spark.implicits._
    val lake = GraftTestSpark.tmpDir("lake_evo_guard") + "/t"
    layDown(lake)
    // drop a registered column -> loud
    val narrow = (40L until 42L).map(i => (i, ts("2024-03-01 10:00:00"), 100 + i))
      .toDF("event_id", "ts", "user_id")
    val e = intercept[IllegalArgumentException] {
      LakeSink.appendBatch(spark, lake, narrow)
    }
    assert(e.getMessage.contains("drop registered column"))
    // retype -> loud
    val retyped = (40L until 42L).map(i =>
      (i, ts("2024-03-01 10:00:00"), 100 + i, "click", i.toFloat, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "quality")
    val e2 = intercept[IllegalArgumentException] {
      LakeSink.appendBatch(spark, lake, retyped)
    }
    assert(e2.getMessage.contains("retype registered column"))

    // merge against the widened lake: upserts carry the full union schema;
    // the rewritten leaf holds mixed-generation files and must read them
    // under the declared schema
    val upserts = Seq((1L, ts("2024-03-02 10:00:11"), 101L, "updated", 100.0, 7))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "quality")
    val deletes = spark.emptyDataset[(Long, Timestamp)].toDF("event_id", "ts")
    val stats = LakeSink.mergeInto(spark, lake, upserts, "event_id", deletes)
    assert(stats.rewrittenLeaves == Seq("event_date=2024-03-02"))
    val back = LakeSink.readLake(spark, lake)
    val updated = back.filter(col("event_id") === 1L).collect()
    assert(updated.length == 1 && updated(0).getAs[Int]("quality") == 7)
    assert(back.count() == 40L)
    // and a stale-schema upsert (missing the registered column) is loud
    val stale = Seq((2L, ts("2024-03-01 10:00:12"), 102L, "updated", 200.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val e3 = intercept[IllegalArgumentException] {
      LakeSink.mergeInto(spark, lake, stale, "event_id", deletes)
    }
    assert(e3.getMessage.contains("does not match"))
  }
}
