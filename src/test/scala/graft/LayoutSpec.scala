package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Layout, Tables}

/** Layout maintenance: compaction must shrink the file count without
  * touching the data, and clustering must leave files holding disjoint key
  * ranges (what makes row-group stats prune range scans).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction collapses a fragmented directory; data identical") {
    val fragged = GraftTestSpark.tmpDir("frag")
    val compacted = GraftTestSpark.tmpDir("compact")
    // simulate a degraded layout: 64 tiny files from an over-parallel writer
    Tables.load(spark, sf, "events").repartition(64).write.mode("overwrite").parquet(fragged)
    assert(parquetFiles(fragged).length === 64)

    val n = Layout.compactParquet(spark, fragged, compacted,
      targetFileBytes = Layout.dataBytes(spark, fragged))
    assert(n === 1)
    assert(parquetFiles(compacted).length === 1)

    // same rows, nothing lost or duplicated
    val a = spark.read.parquet(fragged).select("event_id").collect().map(_.getLong(0)).sorted
    val b = spark.read.parquet(compacted).select("event_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("clustered compaction writes files with disjoint key ranges") {
    val fragged = GraftTestSpark.tmpDir("frag2")
    val clustered = GraftTestSpark.tmpDir("clust")
    Tables.load(spark, sf, "events").repartition(16).write.mode("overwrite").parquet(fragged)

    // force several output files to make the disjointness claim non-trivial
    val n = Layout.compactParquet(spark, fragged, clustered,
      targetFileBytes = math.max(1L, Layout.dataBytes(spark, fragged) / 4),
      clusterBy = Seq("user_id"))
    assert(n >= 3, s"expected a multi-file clustered layout, got $n")

    // each file must hold a user_id range that overlaps no other file —
    // range partitioning + in-file sort is exactly what lets parquet
    // row-group stats answer "user_id BETWEEN a AND b" by skipping files
    val ranges = spark.read.parquet(clustered)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length >= 3)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
    // data unchanged
    assert(spark.read.parquet(clustered).count() === spark.read.parquet(fragged).count())
  }
}
