package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, max, unix_millis}

/** Late-data QUARANTINE (dead-letter audit) — the answer to "where did my
  * late rows go". A watermarked stateful operator silently discards rows
  * that arrive behind the watermark (st12 prices the drop); production
  * pipelines additionally need the dropped rows THEMSELVES — routed to a
  * quarantine table for audit, alerting, and backfill — and the engine
  * offers no hook for that: by the time the stateful operator applies its
  * late filter, the rows are gone.
  *
  * This is the standard dual-write answer, made deterministic: a
  * foreachBatch classifier that maintains its OWN event-time watermark in
  * a tiny per-batch ledger and quarantines each micro-batch's late rows
  * by the SAME rule the engine applies to the main pipeline —
  * SPARK-40925's two-batch lag, `wm(b) = max event time over batches
  * ≤ b−2, minus the delay` (see WatermarkCanarySpec, which pins that rule
  * against upgrades). Agreeing with the engine is the point: a row lands
  * in quarantine iff the main pipeline's late filter would discard it, so
  * main + quarantine partition the input exactly.
  *
  * Why a ledger instead of reading the engine's watermark from
  * StreamingQueryProgress: progress is an ASYNC observer API — inside
  * foreachBatch the current batch's progress row does not exist yet, and
  * a restart-replayed batch would see whatever progress the PREVIOUS run
  * left, silently reclassifying rows. The ledger writes one
  * `(batch_id, max_ts)` row per batch under an idempotent per-batch path
  * (mode=overwrite on `b<id>/`), so a batch replayed from checkpoint
  * recomputes the identical watermark and the identical quarantine set —
  * the same discipline as [[LakeSink]]'s commit markers. Ledger size is
  * one row per micro-batch (progress metadata, not data); the per-batch
  * classify is a shuffle-free filter on the already-materialized batch.
  */
object LateAudit {

  /** The foreachBatch classifier: records this batch's max event time in
    * the ledger and returns the batch's LATE rows (the quarantine
    * channel). Shaped as a `sinkEnrich` closure so the replay harness's
    * idempotent per-batch sink captures the quarantine table itself.
    *
    * The per-batch history is held in the closure and the on-disk ledger
    * is read ONCE, lazily, to seed it — a classifier that re-read the
    * whole ledger every batch would pay one file listing per PRIOR batch
    * per batch (quadratic over the stream's life; ~500k micro-batches a
    * year at minutes cadence). The disk ledger exists for restart
    * recovery: a new closure instance (new query run) seeds from it, and
    * a replayed batch still computes its watermark from entries ≤ b−2
    * only, so the census is replay-identical either way. Seeding is
    * per-entry and torn-entry-tolerant: a crash mid-ledger-write leaves a
    * partial `b<id>/` parquet dir, and a single recursive read over the
    * whole ledger would fail loudly on that unreadable footer BEFORE the
    * replayed batch's idempotent overwrite could repair it — wedging every
    * restart until the dir is hand-deleted. Skipping the torn entry is
    * correct: its batch is by construction the one the engine is about to
    * replay (only an in-flight batch can tear), and the replay rewrites it.
    *
    * ATTACHMENT REQUIREMENT: the documented engine-watermark equivalence
    * holds only when this classifier is attached where it sees the SAME
    * rows as the watermark operator (st33 attaches it to the identity
    * transform). A filtering transform upstream silently diverges the
    * ledger's max event time from the engine's per-batch stats — attach
    * the quarantine BEFORE any row-dropping transform, or accept that the
    * replicated watermark tracks the filtered stream instead.
    */
  def quarantine(ledgerDir: String, tsCol: String = "ts",
      delayMs: Long = 600000L): (DataFrame, Long) => DataFrame = {
    val history = scala.collection.mutable.Map.empty[Long, Long]
    var seeded = false
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (!seeded) {
        val dir = new org.apache.hadoop.fs.Path(ledgerDir)
        val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // an existing-but-entryless ledger (first batches; pre-created temp
        // dir) has no schema to infer — seed empty
        if (fs.exists(dir))
          fs.listStatus(dir)
            .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
            .foreach { entry =>
              // per-entry read with a skip on failure: a torn entry (crash
              // mid-write) must not wedge the restart — see scaladoc; its
              // batch is the one the engine replays, and the replay's
              // mode=overwrite rewrite repairs the dir
              try spark.read.parquet(entry.getPath.toString).collect()
                .foreach(r => history(r.getAs[Long]("batch_id")) =
                  r.getAs[Long]("max_ts"))
              catch {
                case scala.util.control.NonFatal(e) =>
                  System.err.println(s"[late-audit] skipping torn ledger entry " +
                    s"${entry.getPath.getName} (${e.getClass.getSimpleName}) — " +
                    "the replayed batch's overwrite will repair it")
              }
            }
        seeded = true
      }
      val past = history.collect { case (id, mx) if id <= batchId - 2 => mx }
      val wmMs: Option[Long] =
        if (past.isEmpty) None else Some(past.max - delayMs)
      // record AFTER computing the watermark (this batch must not see its
      // own max), in memory and under an idempotent per-batch ledger path;
      // the schema-probe's empty batch and data-less sentinel replays
      // write nothing
      val mx = batch.agg(max(unix_millis(col(tsCol)))).head()
      if (!mx.isNullAt(0)) {
        import spark.implicits._
        history(batchId) = mx.getLong(0)
        Seq((batchId, mx.getLong(0))).toDF("batch_id", "max_ts")
          .coalesce(1).write.mode("overwrite").parquet(s"$ledgerDir/b$batchId")
      }
      wmMs match {
        case Some(w) => batch.filter(unix_millis(col(tsCol)) < w)
        case None    => batch.limit(0)
      }
    }
  }
}
