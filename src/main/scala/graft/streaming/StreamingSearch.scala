package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions._

/** Streaming vector search: a stream of query vectors scored against a
  * static corpus — the online half of the reference's /search endpoint
  * re-expressed as a stream-static join (supported natively by
  * Structured Streaming; the static side is broadcast per micro-batch
  * when small, and the IVF shard filter applies before scoring).
  *
  * Per-query top-k needs per-group ranking, which streaming append
  * mode can't window — so ranking happens per micro-batch in
  * foreachBatch, the standard pattern for micro-batch-local top-k.
  */
object StreamingSearch {

  /** Scored candidates for every (query x corpus-vector) pair, with the
    * corpus optionally pre-filtered to probed shards.
    */
  def score(queries: DataFrame, corpus: DataFrame,
            idCol: String = "id", vecCol: String = "vector"): DataFrame =
    queries
      .join(broadcast(corpus.select(col(idCol), col(vecCol).cast("array<double>").as("cv"))),
        expr("true"))
      .withColumn("score", cosineSim(col("qv"), col("cv")))
      .select(col("query_id"), col(idCol), col("score"))

  /** Rank and truncate one micro-batch to top-k per query — call from
    * foreachBatch.
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("score"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
