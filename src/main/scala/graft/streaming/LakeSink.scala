package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, to_date}

import graft.core.Layout

/** Streaming sink → partitioned lake layout.
  *
  * ReplayHarness's oracle sink writes flat per-batch directories (the right
  * shape for hash-compared replays); a production deployment appends into a
  * date-partitioned table and periodically compacts, because a micro-batch
  * cadence of minutes lays down hundreds of small files per day and every
  * downstream scan then pays per-file open/footer costs (see
  * [[graft.core.Layout]]). This is that sink: a foreachBatch closure that
  *
  *   1. derives `event_date` from the event-time column and appends
  *      Hive-partitioned (`event_date=YYYY-MM-DD/`) parquet — so the f4-style
  *      partition-pruned read path applies to the lake as written;
  *   2. is IDEMPOTENT per micro-batch: a committed-batch ledger
  *      (`_graft_commits/<batchId>` marker files — underscore-prefixed, so
  *      Spark's partition discovery ignores it) makes a batch replayed after
  *      restart-from-checkpoint a no-op instead of an append of duplicates.
  *      The marker lands AFTER the data: a crash in between replays the
  *      batch's rows once more (at-least-once for that one batch — closing
  *      that window needs a transactional table format's atomic commit,
  *      which plain parquet-on-FS cannot express; every FS-level lake sink
  *      has this same window);
  *   3. every `compactEvery` batches, rewrites any partition holding >=
  *      `minFilesToCompact` files through [[Layout.compactParquet]] at the
  *      target file size and swaps it into place (delete + rename — atomic
  *      enough on a real FS for the single-writer streaming job this is;
  *      concurrent READERS of the partition being swapped can observe a
  *      partial listing, the standard caveat of non-transactional lakes).
  *
  * At 100 TB/day the numbers work like this: one day ≈ one partition family,
  * compaction touches only partitions the recent batches dirtied (the
  * listing is per-leaf, never a full-table scan), and each rewrite is
  * [[Layout.compactParquet]]'s single measured-size shuffle — the bounded
  * standing maintenance cost that keeps scan-side file counts O(bytes /
  * targetFileBytes) forever.
  */
object LakeSink {

  /** The foreachBatch closure. `compactEvery <= 0` disables compaction.
    *
    * Sweep scope: each sink instance tracks the partitions its OWN appends
    * dirtied since the last sweep (one k-row distinct-dates probe per
    * batch — the same per-commit partition-values bookkeeping every
    * transactional lake format does) and compacts ONLY those, so a sweep
    * costs O(dirtied leaves), never O(all leaves): against a lake with
    * years of date partitions on an object store, listing every leaf per
    * sweep would be thousands of LIST calls for a handful of dirty dates.
    * The dirty set is in-memory per instance: partitions dirtied just
    * before a crash stay uncompacted until re-dirtied or until a
    * scheduled FULL sweep (`compactPartitions(..., only = None)`) — the
    * documented backstop; compaction is opportunistic maintenance, never
    * a correctness dependency.
    */
  def datePartitioned(
      lakeDir: String,
      tsCol: String = "ts",
      compactEvery: Long = 10L,
      targetFileBytes: Long = 128L << 20,
      minFilesToCompact: Int = 4): (DataFrame, Long) => Unit = {
    val dirty = scala.collection.mutable.Set.empty[String]
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val root = new Path(lakeDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new Path(new Path(root, "_graft_commits"), batchId.toString)
      if (fs.exists(marker)) {
        // restart-from-checkpoint replay of an already-committed batch:
        // the ledger makes it a no-op (this exact path is what keeps the
        // lake duplicate-free across the st10/st27-style kill+restart)
        System.err.println(s"[lake] batch $batchId already committed, skipping")
      } else {
        val dated = batch.withColumn("event_date", to_date(col(tsCol)))
        dated.write.partitionBy("event_date").mode("append").parquet(lakeDir)
        dirty ++= dated.select("event_date").distinct().collect()
          .map(r => s"event_date=${r.get(0)}")
        fs.create(marker, true).close()
      }
      if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
        compactPartitions(spark, lakeDir, targetFileBytes, minFilesToCompact,
          only = Some(dirty.toSet))
        dirty.clear()
      }
  }

  /** Retention VACUUM — the third lifecycle verb after append and compact:
    *
    *   1. drops every `event_date=` leaf strictly OLDER than `before`
    *      (data retention; the cutoff is an explicit parameter, not
    *      wall-clock, so runs are deterministic and testable);
    *   2. removes orphaned `_compact_tmp` children — a sweep that crashed
    *      between its rewrite and its swap leaves a tmp leaf behind, and
    *      nothing else ever cleans it;
    *   3. prunes commit-ledger markers below `max marker − ledgerKeep`.
    *      Unbounded, the ledger grows one tiny file per micro-batch
    *      forever (a minutes-cadence stream is ~500k files/year — a real
    *      small-file problem on its own). Pruning old markers is safe
    *      because the engine can only ever replay the batches after its
    *      last checkpointed commit — a marker far older than the current
    *      batch id can never be consulted again; `ledgerKeep` just has to
    *      exceed the deepest possible replay window (1 under clean
    *      semantics; default 1000 is paranoid).
    *
    * Returns (dropped partition names, pruned marker count).
    */
  def vacuum(
      spark: org.apache.spark.sql.SparkSession,
      lakeDir: String,
      before: java.time.LocalDate,
      ledgerKeep: Long = 1000L): (Seq[String], Int) = {
    val root = new Path(lakeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Seq.empty, 0)
    val dropped = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
      .filter { s =>
        val d = s.getPath.getName.stripPrefix("event_date=")
        try java.time.LocalDate.parse(d).isBefore(before)
        catch { case _: java.time.format.DateTimeParseException => false }
      }
      .map { s =>
        fs.delete(s.getPath, true)
        System.err.println(s"[lake] vacuumed ${s.getPath.getName}")
        s.getPath.getName
      }
    val tmpRoot = new Path(root, "_compact_tmp")
    if (fs.exists(tmpRoot)) fs.listStatus(tmpRoot).foreach { orphan =>
      System.err.println(s"[lake] removed orphaned sweep ${orphan.getPath.getName}")
      fs.delete(orphan.getPath, true)
    }
    val ledger = new Path(root, "_graft_commits")
    val prunedMarkers = if (!fs.exists(ledger)) 0
    else {
      val ids = fs.listStatus(ledger).toSeq
        .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit))
      val horizon = ids.map(_.getPath.getName.toLong)
        .foldLeft(Long.MinValue)(math.max) - ledgerKeep
      val old = ids.filter(_.getPath.getName.toLong < horizon)
      old.foreach(s => fs.delete(s.getPath, false))
      old.size
    }
    (dropped, prunedMarkers)
  }

  /** One compaction sweep: rewrite every `event_date=*` leaf holding at
    * least `minFiles` parquet files down to the [[Layout.compactParquet]]
    * measured-size file count. `only = Some(names)` restricts the sweep to
    * those partition directory names (the dirty-set fast path);
    * `only = None` is the full-table sweep (the scheduled backstop).
    * Returns (partition name, files before, files after) per rewritten
    * partition.
    */
  def compactPartitions(
      spark: org.apache.spark.sql.SparkSession,
      lakeDir: String,
      targetFileBytes: Long,
      minFiles: Int,
      only: Option[Set[String]] = None): Seq[(String, Int, Int)] = {
    val root = new Path(lakeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val tmpRoot = new Path(root, "_compact_tmp")
    // dirty-set path: address the named leaves directly — O(|dirty|) FS
    // calls, no root enumeration; full sweep lists the table once
    val leaves: Seq[Path] = only match {
      case Some(names) => names.toSeq.sorted.map(new Path(root, _)).filter(fs.exists)
      case None => fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("event_date="))
        .map(_.getPath)
    }
    leaves.flatMap { leaf =>
      val before = fs.listStatus(leaf)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (before < minFiles) None
      else {
        val tmp = new Path(tmpRoot, leaf.getName)
        // the leaf's files carry no event_date column (partitionBy strips
        // it), so a plain rewrite within the same leaf round-trips exactly
        val after = Layout.compactParquet(
          spark, leaf.toString, tmp.toString, targetFileBytes)
        fs.delete(leaf, true)
        require(fs.rename(tmp, leaf),
          s"compaction swap failed for $leaf")
        System.err.println(
          s"[lake] compacted ${leaf.getName}: $before -> $after files")
        Some((leaf.getName, before, after))
      }
    }
  }
}
