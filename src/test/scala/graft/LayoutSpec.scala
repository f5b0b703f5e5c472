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

  test("z-order layout prunes on both dimensions where 1-D clustering cannot") {
    val in = GraftTestSpark.tmpDir("zin")
    val lin = GraftTestSpark.tmpDir("zlin")
    val zed = GraftTestSpark.tmpDir("zord")
    val nFiles = 16
    Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
      .repartition(4).write.mode("overwrite").parquet(in)
    Layout.compactParquet(spark, in, lin,
      targetFileBytes = math.max(1L, Layout.dataBytes(spark, in) / nFiles),
      clusterBy = Seq("l_partkey"))
    Layout.zorderParquet(spark, in, zed, "l_partkey", "l_suppkey", nFiles)

    // middle-decile band of a column's observed range
    def band(c: String): (Long, Long) = {
      val r = spark.read.parquet(in).agg(min(c), max(c)).collect()(0)
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      (lo + (hi - lo) * 45 / 100, lo + (hi - lo) * 55 / 100)
    }
    // files whose min/max stats overlap [lo, hi] — what a stats-driven
    // reader must open for `c BETWEEN lo AND hi`
    def filesOverlapping(dir: String, c: String, lo: Long, hi: Long): (Int, Int) = {
      val ranges = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(c).as("lo"), max(c).as("hi")).collect()
      (ranges.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo), ranges.length)
    }

    val (slo, shi) = band("l_suppkey")
    val (plo, phi) = band("l_partkey")

    // 1-D clustering leaves l_suppkey unconstrained in every file: a
    // suppkey band can prune (almost) nothing. Z-order tiles BOTH
    // dimensions, so the same band must skip files.
    val (linSupp, linTotal) = filesOverlapping(lin, "l_suppkey", slo, shi)
    val (zSupp, zTotal) = filesOverlapping(zed, "l_suppkey", slo, shi)
    assert(linSupp === linTotal, "1-D layout unexpectedly pruned the off-cluster column")
    assert(zSupp < zTotal, s"z-order skipped nothing on suppkey ($zSupp/$zTotal)")
    assert(zSupp.toDouble / zTotal < linSupp.toDouble / linTotal)

    // and z-order still prunes the FIRST dimension too (1-D clustering is
    // sharper there — that is its entire advantage — but z must beat "read
    // everything")
    val (zPart, _) = filesOverlapping(zed, "l_partkey", plo, phi)
    assert(zPart < zTotal, s"z-order skipped nothing on partkey ($zPart/$zTotal)")

    // layout changes nothing semantically: the 2-D box query agrees
    def boxCount(dir: String): Long = spark.read.parquet(dir)
      .filter(col("l_partkey").between(plo, phi) && col("l_suppkey").between(slo, shi))
      .count()
    assert(boxCount(zed) === boxCount(in))
    assert(boxCount(lin) === boxCount(in))
  }
}
