package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release helper for `localCheckpoint()`ed frames inside driver-launched
  * iteration loops (bpeTrain, mmrRerank, connectedComponents-style
  * frontiers).
  *
  * `Dataset.unpersist()` cannot free a local checkpoint: the blocks belong
  * to the checkpointed RDD (persisted by `RDD.localCheckpoint`), which the
  * CacheManager never sees — so a loop that re-checkpoints its frontier
  * every round accumulates one dead row-set copy per round in executor
  * storage for the life of the session. Harmless at fixture scale, linear
  * growth at a production-sized train. This helper reaches through the
  * checkpointed frame's `LogicalRDD` plan node and unpersists the backing
  * RDD directly.
  *
  * Safe to call only once the SUPERSEDING checkpoint has materialized
  * (eager localCheckpoint — the default — guarantees that by the time the
  * call returns), because the new checkpoint's lineage was computed FROM
  * the old one's blocks.
  *
  * RELATED HAZARD for loops that JOIN their checkpointed frontier with
  * itself: localCheckpoint truncates execution lineage but the resulting
  * LogicalRDD INHERITS the checkpointed plan's sizeInBytes estimate
  * (originalStats), so a loop with two frontier joins per round grows the
  * estimate's BigInt digit count geometrically — past ~12 executed rounds
  * Catalyst's stats visitor grinds minutes per round on million-digit
  * multiplications while the cluster sits idle. Reset at the round
  * boundary with an RDD boundary (`createDataFrame(df.rdd, df.schema)` —
  * drops originalStats, estimate restarts from defaultSizeInBytes); see
  * ClusterOps.connectedComponents for the worked fix. Loops whose rounds
  * join the frontier with CONSTANT-stats frames only (bpeTrain,
  * mmrRerank) grow linearly and do not need it.
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD behind `df` (no-op for frames that are
    * not local checkpoints). Non-blocking: block removal proceeds async.
    *
    * Fails loudly on a MARKED-but-unmaterialized local checkpoint (a
    * `localCheckpoint(eager = false)` frame before any action): the cached
    * blocks would become the checkpoint's only copy once truncation runs,
    * so unpersisting here silently destroys data and resurfaces later as
    * an unrelated-looking "checkpoint block not found". Callers must
    * release only after the superseding eager checkpoint materialized.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: LogicalRDD =>
        val rdd = r.rdd
        // persisted but not yet checkpointed = a lazy localCheckpoint whose
        // cached blocks are still the future checkpoint's ONLY source
        // (isLocallyCheckpointed is private[spark]; storageLevel + public
        // isCheckpointed distinguish the same state)
        if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE &&
            !rdd.isCheckpointed)
          throw new IllegalStateException(
            s"Checkpoints.release on RDD ${rdd.id}: local checkpoint marked " +
              "but not yet materialized (lazy localCheckpoint before an " +
              "action); releasing now would destroy its only copy")
        rdd.unpersist(blocking = false)
      case _ => ()
    }
}
