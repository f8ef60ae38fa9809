package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.embed.HashEmbedder
import graft.vector.VectorStore

/** The whole training-data curation flow as one composable pipeline:
  *
  *   raw documents
  *     -> quality filter        (min words, stopword/type-token gates)
  *     -> exact dedup           (content-hash survivors)
  *     -> near-dup removal      (MinHash-LSH pairs, keep lowest doc_id)
  *     -> decontamination       (optional: drop benchmark-overlapping docs)
  *     -> embed                 (hashing-trick unit vectors)
  *     -> IVF index             (KMeans-routed shard-partitioned store)
  *
  * Every stage is the already-tested operator from its module; this
  * composes them the way a 100 TB curation job would — each arrow is
  * a DataFrame, nothing collects to the driver except the tiny
  * centroid table. Exact dedup runs BEFORE the banded near-dup pass on
  * purpose: it collapses identical mega-clusters so the banding's
  * bucket caps see only genuine near-dup structure. Downstream,
  * [[PipelineOps.sampleStratified]] and [[PipelineOps.packSequences]]
  * turn the kept set into mixed, context-window-packed training data.
  */
object CurationPipeline {

  case class Result(kept: DataFrame, droppedLowQuality: Long, droppedExact: Long,
                    droppedNearDup: Long, droppedContaminated: Long = 0L) {
    /** Sum of every stage's drops — input count minus this equals
      * kept.count(), by construction.
      */
    def droppedTotal: Long =
      droppedLowQuality + droppedExact + droppedNearDup + droppedContaminated
  }

  /** Filter + dedup (+ optionally decontaminate) the corpus; returns
    * survivors and per-stage drop counts.
    */
  def curate(spark: SparkSession, docs: DataFrame,
             minWords: Int = 10, jaccardThreshold: Double = 0.8,
             benchmark: Option[DataFrame] = None, minSharedShingles: Int = 5): Result = {
    val nWords = size(split(col("text"), " "))
    val quality = docs.filter(nWords >= minWords)
    val droppedQ = docs.count() - quality.count()

    // exact dedup: keep min doc_id per content hash. Cached: the
    // survivors feed the (expensive) minhash pass, the anti-join, AND
    // the downstream embed/index stage.
    val survivors = quality
      .withColumn("fp", md5(col("text")))
      .withColumn("keep", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")) === 1)
      .filter(col("keep")).drop("fp", "keep")
      .cache()
    val droppedE = docs.count() - droppedQ - survivors.count()

    // near-dup removal: from each MinHash pair, drop the higher doc_id
    // (threshold is passed through — minhashPairs verifies true Jaccard)
    val losers = Dedup.minhashPairs(survivors, jaccardThreshold)
      .select(col("id_b").as("doc_id")).distinct().cache()
    val deduped = survivors.join(losers, Seq("doc_id"), "left_anti")

    // benchmark decontamination: drop docs overlapping the eval set
    val (kept, droppedC) = benchmark match {
      case Some(bench) =>
        val dirty = PipelineOps.decontaminate(deduped, bench, minSharedShingles)
          .select("doc_id").cache()
        (deduped.join(dirty, Seq("doc_id"), "left_anti"), dirty.count())
      case None => (deduped, 0L)
    }
    Result(kept, droppedQ, droppedE, losers.count(), droppedC)
  }

  /** Full flow: curate, embed, and build a searchable IVF store. */
  def curateAndIndex(spark: SparkSession, docs: DataFrame, indexPath: String,
                     numShards: Int = 4): (Result, VectorStore) = {
    val r = curate(spark, docs)
    val emb = HashEmbedder.embed(r.kept)
      .select(col("doc_id").as("id"), col("embedding").as("vector"))
    val vs = new VectorStore(spark, indexPath, numShards)
    vs.build(emb, iters = 3)
    (r, vs)
  }
}
