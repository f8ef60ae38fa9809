package org.apache.spark.sql
package graftshim

/** Release the executor-storage blocks behind a `localCheckpoint(true)`
  * Dataset. Spark offers no public unpersist for checkpointed frames
  * (`Dataset.unpersist` only talks to the CacheManager), so iterative
  * algorithms that checkpoint per round — e.g. connected components —
  * leak one materialized frame per round for the session lifetime.
  * The checkpointed data lives in an RDD referenced by the plan's
  * `LogicalRDD` leaf; unpersisting that RDD frees the blocks.
  *
  * CAUTION: a localCheckpoint truncates lineage, so once unpersisted
  * the Dataset is NOT recomputable — only release frames that are
  * fully superseded (every downstream consumer already materialized).
  *
  * Multi-leaf hazard: a plan built by JOINING two checkpointed frames
  * has several LogicalRDD leaves, and unpersisting them all would free
  * blocks a still-live sibling frame depends on — later actions on the
  * sibling then fail with "checkpoint block not found" instead of
  * recomputing. So this releases ONLY when the plan has exactly one
  * LogicalRDD leaf (the frame's own checkpoint) and is a silent no-op
  * otherwise; callers that really need multi-leaf release must
  * unpersist each source frame individually while they still hold it.
  */
object CheckpointInterop {
  def unpersistCheckpoint(ds: Dataset[_]): Unit = ds match {
    case c: classic.Dataset[_] =>
      val leaves = c.queryExecution.analyzed.collect {
        case l: execution.LogicalRDD => l.rdd
      }
      if (leaves.size == 1) leaves.head.unpersist(blocking = false)
    case _ => ()
  }
}
