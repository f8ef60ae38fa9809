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
  */
object CheckpointInterop {
  def unpersistCheckpoint(ds: Dataset[_]): Unit = ds match {
    case c: classic.Dataset[_] =>
      c.queryExecution.analyzed.foreach {
        case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
        case _ => ()
      }
    case _ => ()
  }
}
