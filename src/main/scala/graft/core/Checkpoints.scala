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
  */
object Checkpoints {

  /** Unpersist the checkpointed RDD behind `df` (no-op for frames that are
    * not local checkpoints). Non-blocking: block removal proceeds async.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case r: LogicalRDD => r.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
