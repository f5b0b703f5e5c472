package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Data-layout maintenance: small-file compaction and range clustering.
  *
  * At 100 TB the dominant failure mode of a long-lived table is not a wrong
  * plan but a degraded LAYOUT: streaming sinks and over-parallel writers
  * leave thousands of KB-sized files per partition, and every downstream
  * scan pays per-file open/footer costs plus driver-side listing memory.
  * Compaction is the standing maintenance job that rewrites a directory at
  * a target file size; clustering additionally range-partitions and sorts
  * by chosen columns so parquet row-group min/max stats prune reads for
  * range predicates (the poor man's Z-order, and the right one for
  * single-column locality).
  */
object Layout {

  /** Total bytes of the parquet data files under `dir` (measured, not
    * estimated — the compaction decision should follow the real layout).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile)
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Rewrite the parquet directory `inDir` into `outDir` with file count
    * chosen from the MEASURED input size and a target file size (default
    * 128 MiB — one HDFS-ish block, the classic sweet spot between listing
    * overhead and scan parallelism). Returns the file count written.
    *
    * With `clusterBy` columns, rows are range-partitioned and sorted within
    * each file on those columns: files then hold disjoint key ranges and
    * row-group stats make range scans skip whole files. A plain compaction
    * (clusterBy empty) is one round-robin shuffle; clustering is one range
    * shuffle + per-partition sort — either way a single pass over the data,
    * which is the budget any 100 TB maintenance job must hold.
    */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long = 128L << 20,
      clusterBy: Seq[String] = Nil,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    // `transform` runs on the fresh file scan (so `_metadata` columns are
    // still resolvable) and must be row-FILTERING only — the lake uses it
    // to materialize deletion vectors during a rewrite. File-count sizing
    // stays measured-from-input: a filter can only shrink the output.
    val df = transform(spark.read.parquet(inDir))
    val total = dataBytes(spark, inDir)
    val nFiles = math.max(1L, (total + targetFileBytes - 1) / targetFileBytes).toInt
    val shaped =
      if (clusterBy.isEmpty) df.repartition(nFiles)
      else {
        val cols = clusterBy.map(org.apache.spark.sql.functions.col)
        df.repartitionByRange(nFiles, cols: _*).sortWithinPartitions(cols: _*)
      }
    shaped.write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Z-value (Morton interleave) of two columns already scaled to
    * non-negative ints below 2^bits: bit i of x lands at position 2i, bit i
    * of y at 2i+1. Pure integer arithmetic — codegen-friendly, no UDF.
    */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Rewrite `inDir` Z-ORDERED on two numeric columns: each column is
    * min/max-scaled onto a 2^bits grid, the interleaved z-value drives one
    * range partition + per-partition sort, and files then cover compact
    * 2-D tiles of the (colX, colY) space — so parquet min/max stats prune
    * files for predicates on EITHER column (range-clustering on one column,
    * [[compactParquet]]'s `clusterBy`, prunes only that column and leaves
    * the other unconstrained in every file).
    *
    * The min/max scaling bounds are two scalar aggregates collected on the
    * driver — configuration for the rewrite (like nFiles), not row data;
    * the rewrite itself stays one shuffle + sort, the same single-pass
    * budget as compaction. This is the layout a 100 TB fact table wants
    * when its scan predicates alternate between two independent dimensions
    * (e.g. part and supplier, user and time).
    */
  def zorderParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      colX: String,
      colY: String,
      nFiles: Int,
      bits: Int = 8,
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity): Unit = {
    import org.apache.spark.sql.functions.{coalesce, col, floor, least, lit, max, min}
    // same contract as [[compactParquet]]'s transform: row-filtering only,
    // applied to the fresh scan (deletion-vector materialization); the
    // scaling bounds below are computed post-filter, which only tightens
    val df = transform(spark.read.parquet(inDir))
    // one stats row to the driver: bounds are rewrite CONFIGURATION. Cast
    // inside the agg so a non-numeric column fails analysis with the column
    // name, not an opaque NumberFormatException from toString parsing.
    val bounds = df.agg(
      min(col(colX).cast("double")), max(col(colX).cast("double")),
      min(col(colY).cast("double")), max(col(colY).cast("double"))).collect()(0)
    require(!bounds.anyNull,
      s"zorderParquet($colX, $colY): a z-order column is all-NULL (or casts " +
        "to all-NULL) — no bounds to scale against; clean or drop the column first")
    val Array(xmin, xmax, ymin, ymax) = (0 until 4).map(bounds.getDouble).toArray
    val grid = (1 << bits) - 1
    // NULL cells scale to grid cell 0 (z-curve origin) instead of a NULL
    // __z silently range-partitioning into one file: co-locating NULLs at
    // the origin keeps them one contiguous, min/max-prunable run.
    def scaled(c: String, lo: Double, hi: Double) =
      coalesce(
        least(floor((col(c).cast("double") - lo) / math.max(hi - lo, 1e-12) * (grid + 1))
          .cast("long"), lit(grid.toLong)),
        lit(0L))
    df.withColumn("__z", zValue(scaled(colX, xmin, xmax), scaled(colY, ymin, ymax), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }
}
