package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Backs the Tables.scala claim that "at 100 TB these paths would be
  * partitioned directories and everything downstream is unchanged": writes a
  * partitioned copy of `orders` (Hive-style year directories, the layout a
  * petabyte fact table actually ships in), runs a year-filtered aggregation
  * against it, and asserts the scan PRUNES — partition filters reach the
  * file index, and only the matching year's files are listed/read. This is
  * the I/O-side complement to PlanShapeSpec's predicate-pushdown guard: at
  * 100 TB, partition pruning is the difference between reading one year and
  * reading the decade.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private lazy val partedDir: String = {
    val dir = GraftTestSpark.tmpDir("orders_parted")
    Tables.load(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    dir
  }

  /** The FileSourceScanExec of a query, descending AQE wrappers. */
  private def fileScan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    def find(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      (p match { case f: FileSourceScanExec => Seq(f); case _ => Seq.empty }) ++
        kids.flatMap(find)
    }
    val scans = find(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a parquet file scan in the plan")
    scans.head
  }

  test("year filter prunes to one partition directory (PartitionFilters at the scan)") {
    val parted = spark.read.parquet(partedDir)
    val q = parted.filter(col("o_year") === 1995)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("revenue"))
    q.collect()

    val scan = fileScan(q)
    // the partition predicate must be a partition filter (file-index level,
    // applied at listing time), not a data filter evaluated per row
    assert(scan.partitionFilters.map(_.toString).exists(_.contains("o_year")),
      s"expected the o_year predicate in PartitionFilters, got: ${scan.partitionFilters}")

    // only the 1995 directory's files are selected — the pruned scan must
    // read strictly fewer files than the full table has
    val totalFiles = fileScan({ val full = spark.read.parquet(partedDir); full.collect(); full })
      .metrics("numFiles").value
    val prunedFiles = scan.metrics("numFiles").value
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"expected pruned scan to read fewer files: pruned=$prunedFiles total=$totalFiles")

    val years = spark.read.parquet(partedDir).select("o_year").distinct().count()
    assert(years > 1, "fixture must span multiple years for the pruning test to mean anything")
  }

  test("join-driven dynamic partition pruning reaches the fact scan") {
    // no literal year predicate anywhere: the year set comes from a FILTERED
    // DIMENSION at runtime, which is how a 100 TB fact table is actually
    // probed ("this quarter's campaigns" -> only those partitions read).
    // Spark must inject a dynamicpruning subquery filter into the fact
    // scan's partition filters, reusing the dim broadcast.
    import spark.implicits._
    val parted = spark.read.parquet(partedDir)
    // the dim must be a FILE relation: a LocalRelation's filter is folded
    // into the relation by ConvertToLocalRelation before the DPP rule looks
    // for a selective predicate, so no pruning subquery would be planted
    val dimDir = GraftTestSpark.tmpDir("year_dim")
    Seq((1995, "pick"), (1994, "skip"), (1993, "skip"))
      .toDF("dim_year", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = parted.join(dim.filter(col("tag") === "pick"),
        col("o_year") === col("dim_year"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    q.collect()

    val scan = fileScan(q)
    assert(scan.partitionFilters.map(_.toString.toLowerCase).exists(_.contains("dynamicpruning")),
      s"expected a dynamicpruning filter on the fact scan, got: ${scan.partitionFilters}")
    val totalFiles = fileScan({ val full = spark.read.parquet(partedDir); full.collect(); full })
      .metrics("numFiles").value
    val prunedFiles = scan.metrics("numFiles").value
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"expected the dynamic filter to skip partitions: pruned=$prunedFiles total=$totalFiles")
  }

  test("downstream query logic is unchanged on the partitioned layout") {
    // the same aggregation over the flat fixture, filtered the slow way,
    // must agree with the pruned partitioned read — partitioning is a
    // layout choice, never a semantics choice
    val flat = Tables.load(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1995)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .collect()
    val parted = spark.read.parquet(partedDir)
      .filter(col("o_year") === 1995)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .collect()
    assert(flat.toSeq == parted.toSeq)
  }
}
