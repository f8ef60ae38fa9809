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
  *     -> LM quality gate       (optional: corpus-bigram mean log-prob
  *                               threshold, TextAnalysis.lmScores)
  *     -> exact dedup           (content-hash survivors)
  *     -> near-dup removal      (MinHash-LSH pairs, keep lowest doc_id)
  *     -> containment gate      (optional: drop docs mostly contained
  *                               in a kept doc — quote/subset dups
  *                               Jaccard under-scores)
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
                    droppedNearDup: Long, droppedContaminated: Long = 0L,
                    droppedLowLm: Long = 0L, droppedContained: Long = 0L) {
    /** Sum of every stage's drops — input count minus this equals
      * kept.count(), by construction.
      */
    def droppedTotal: Long =
      droppedLowQuality + droppedLowLm + droppedExact + droppedNearDup +
        droppedContained + droppedContaminated

    /** Unpin `kept`'s cached backing frame once it has been consumed
      * (written out / counted) — `kept` is a filter OVER the cached
      * internal frame, so unpersisting `kept` itself would be a
      * no-op. A one-shot batch run can skip this — the cache dies
      * with the session — but a caller invoking curate REPEATEDLY in
      * one session (per micro-batch in
      * [[graft.streaming.StreamingCuration]]) must release, or dead
      * cached frames accumulate in the block manager for the stream's
      * lifetime.
      */
    def release(): Unit = onRelease()
    private[pipeline] var onRelease: () => Unit = () => ()
  }

  /** Filter + dedup (+ optionally decontaminate) the corpus; returns
    * survivors and per-stage drop counts.
    *
    * Accounting is ONE aggregation job: each stage marks an indicator
    * column (`__q` quality, `__keepE` exact-dedup survivor, `__loser`
    * near-dup loser, `__dirty` contaminated) on the full corpus frame,
    * which is cached and summed once — no per-stage `count()` actions,
    * so bookkeeping adds one corpus pass total instead of five
    * (two of them duplicate `docs.count()`s) at 100 TB. `kept` filters
    * the same cached frame, so the downstream embed/index stage reuses
    * the materialized pass too. (With `clusterNearDups` the component
    * resolution adds its own per-round convergence actions — inherent
    * to the iterative algorithm, not accounting.)
    *
    * `clusterNearDups = true` resolves the MinHash pair graph into
    * connected components first and keeps exactly one doc (the min id)
    * per component — principled under transitivity, where the default
    * pairwise rule (drop each pair's higher id) can keep two docs that
    * share a near-dup neighbor but were never paired directly. The
    * default stays pairwise: it drops less and never chains A~B~C
    * into dropping a C that is genuinely unlike A.
    *
    * `keepBest = true` upgrades the survivor POLICY: the component's
    * highest-quality member survives (composite quality_bp, ties to
    * the lowest doc_id — [[graft.dedup.Dedup.keepBest]]'s rule wired
    * into the pipeline) instead of the lowest id. Implies component
    * resolution (a quality survivor is only well-defined per cluster,
    * so `clusterNearDups` is forced on); the ledger is unchanged —
    * each cluster still drops n−1 members into droppedNearDup, only
    * WHICH member survives moves. Cost over cluster mode: one
    * quality-score join on the pairs-volume membership (the scored
    * side is a map-side projection of the already-cached corpus
    * frame) and a min-of-struct aggregate per cluster — no new
    * corpus-wide shuffle.
    */
  def curate(spark: SparkSession, docs: DataFrame,
             minWords: Int = 10, jaccardThreshold: Double = 0.8,
             benchmark: Option[DataFrame] = None, minSharedShingles: Int = 5,
             benchmarkShingles: Option[DataFrame] = None,
             clusterNearDups: Boolean = false,
             minLmScoreX1e6: Option[Long] = None,
             containmentThreshold: Option[Double] = None,
             keepBest: Boolean = false): Result = {
    val nWords = size(split(col("text"), " "))
    // optional LM-quality gate (CCNet-style): docs whose corpus-bigram
    // mean log-prob sits below the threshold (micro-nats, negative —
    // e.g. 1.15x the corpus median) are gibberish/boilerplate relative
    // to the corpus distribution. Scores come from the FULL input
    // corpus, not the word-gate's survivors: callers calibrate the
    // threshold against the published text_lm_score distribution, and
    // a sub-corpus LM would silently shift every score off that scale.
    // A NULL score (doc too short to have bigrams) passes the gate —
    // no evidence is not low quality, and such docs are the word
    // gate's to judge. Failing the word gate still counts as
    // droppedLowQuality, never double-counted here.
    val withLm: DataFrame => DataFrame = minLmScoreX1e6 match {
      case Some(thr) => base => {
        val scores = graft.text.TextAnalysis.lmScores(base)
          .select(col("doc_id"), (col("avg_logp_x1e6") >= thr).as("__lmq0"))
        base.join(scores, Seq("doc_id"), "left")
          .withColumn("__lm", coalesce(col("__lmq0"), lit(true))).drop("__lmq0")
      }
      case None => base => base.withColumn("__lm", lit(true))
    }
    // exact dedup: identical fingerprint means identical text, so a
    // content-hash group is uniformly quality or uniformly not — the
    // lowest-doc_id member survives iff the group passes the gate
    // cached: the fingerprint window (a corpus-wide shuffle) feeds the
    // minhash candidate actions AND appears twice in the final plan
    // (via withLoser and via decontamination's survivor subtree —
    // Spark does not dedupe common subplans). Without the cache the
    // single-aggregation accounting below would quietly re-run the
    // window shuffle ~3x; unpersisted once `all` is materialized.
    val flagged = withLm(docs)
      .withColumn("__q", nWords >= minWords)
      .withColumn("__fp", md5(col("text")))
      .withColumn("__keepE", col("__q") && col("__lm") && row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__fp")
          .orderBy(col("doc_id"))) === 1)
      .cache()
    val survivors = flagged.filter(col("__keepE"))

    // near-dup removal (threshold passed through — minhashPairs
    // verifies true Jaccard): pairwise drops each pair's higher id;
    // cluster mode drops every non-minimal member of each component
    val pairs = Dedup.minhashPairs(survivors, jaccardThreshold)
    val loserIds =
      if (keepBest) {
        // quality-survivor policy: everyone in the component except
        // its best-quality member drops. Scores come from the near-dup
        // stage's own input (survivors of the exact pass) — membership
        // is pairs-volume, so the join is dup-volume-sized.
        val labels = Dedup.connectedComponents(pairs)
        val scored = graft.text.TextAnalysis.qualityScores(survivors)
          .select(col("doc_id"), col("quality_bp"))
        val best = labels.join(scored, "doc_id")
          .groupBy("cluster_id")
          .agg(min(struct((-col("quality_bp")).as("nq"), col("doc_id"))).as("best"))
          .select(col("cluster_id"), col("best.doc_id").as("__keep_doc"))
        labels.join(best, "cluster_id")
          .filter(col("doc_id") =!= col("__keep_doc")).select("doc_id")
      } else if (clusterNearDups)
        Dedup.connectedComponents(pairs).filter(col("doc_id") =!= col("cluster_id"))
          .select("doc_id")
      else pairs.select(col("id_b").as("doc_id"))
    val losers = loserIds.select(col("doc_id"), lit(true).as("__loser")).distinct()
    val withLoser = flagged.join(losers, Seq("doc_id"), "left")
      .withColumn("__loser", col("__keepE") && coalesce(col("__loser"), lit(false)))

    // optional containment gate: the near-dup pass keeps doc-in-doc
    // pairs (a page quoting most of another has LOW Jaccard when sizes
    // differ); containment catches them. The CONTAINED side drops —
    // the container carries all its information — and when both
    // directions clear the threshold (near-identical sizes the minhash
    // stage happened to miss at its own threshold) the higher id drops,
    // matching the pairwise near-dup rule. Runs on the near-dup
    // SURVIVORS so a doc already dropped never re-drops its container.
    // the drop-side branch reads the UNROUNDED containments: deciding
    // from the 4-dp display columns would flip direction when a
    // sub-threshold value rounds up to the threshold (0.89996→0.9000
    // would drop the container). `drops` is cached: it is a tiny
    // doc-id set whose subtree (the capped-shingle self-join) would
    // otherwise re-execute via both the accounting spine and the
    // decontamination branch below — released with `flagged` once
    // `all` is materialized.
    var containDrops: Option[DataFrame] = None
    val withContained = containmentThreshold match {
      case Some(cthr) =>
        val base = withLoser.filter(col("__keepE") && !col("__loser"))
        val drops = Dedup.containmentPairsRaw(base, cthr)
          .select(
            when(col("__c_a_in_b") >= cthr && col("__c_b_in_a") >= cthr,
              greatest(col("id_a"), col("id_b")))
              .when(col("__c_a_in_b") >= cthr, col("id_a"))
              .otherwise(col("id_b")).as("doc_id"),
            lit(true).as("__contained")).distinct().cache()
        containDrops = Some(drops)
        withLoser.join(drops, Seq("doc_id"), "left")
          .withColumn("__contained",
            col("__keepE") && !col("__loser") && coalesce(col("__contained"), lit(false)))
      case None => withLoser.withColumn("__contained", lit(false))
    }

    // benchmark decontamination: drop kept docs overlapping the eval
    // set. A precomputed shingle frame (write-once, broadcast-many —
    // PipelineOps.benchmarkShingles) wins over re-shingling the suite
    // per run; a raw benchmark is shingled in-plan.
    val withDirty = benchmarkShingles.orElse(benchmark.map(PipelineOps.benchmarkShingles)) match {
      case Some(benchSh) =>
        val deduped = withContained.filter(
          col("__keepE") && !col("__loser") && !col("__contained"))
        val dirty = PipelineOps.decontaminateWith(deduped, benchSh, minSharedShingles)
          .select(col("doc_id"), lit(true).as("__dirty"))
        withContained.join(dirty, Seq("doc_id"), "left")
          .withColumn("__dirty",
            col("__keepE") && !col("__loser") && !col("__contained") &&
              coalesce(col("__dirty"), lit(false)))
      case None => withContained.withColumn("__dirty", lit(false))
    }

    val all = withDirty.cache()
    // sums are coalesced: over an EMPTY corpus (e.g. a watermark-advance
    // micro-batch in StreamingCuration) sum() is NULL while count() is 0
    val acct = all.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(col("__q"), 1L).otherwise(0L)), lit(0L)).as("nQ"),
      coalesce(sum(when(col("__q") && col("__lm"), 1L).otherwise(0L)), lit(0L)).as("nQL"),
      coalesce(sum(when(col("__keepE"), 1L).otherwise(0L)), lit(0L)).as("nE"),
      coalesce(sum(when(col("__loser"), 1L).otherwise(0L)), lit(0L)).as("nL"),
      coalesce(sum(when(col("__contained"), 1L).otherwise(0L)), lit(0L)).as("nC"),
      coalesce(sum(when(col("__dirty"), 1L).otherwise(0L)), lit(0L)).as("nD")).head()
    val (n, nQ, nQL, nE, nL, nC, nD) =
      (acct.getLong(0), acct.getLong(1), acct.getLong(2), acct.getLong(3),
        acct.getLong(4), acct.getLong(5), acct.getLong(6))
    flagged.unpersist() // `all` is materialized; kept filters the cached `all`
    containDrops.foreach(_.unpersist())
    val kept = all.filter(
      col("__keepE") && !col("__loser") && !col("__contained") && !col("__dirty"))
      .drop("__q", "__lm", "__fp", "__keepE", "__loser", "__contained", "__dirty")
    val result = Result(kept, n - nQ, nQL - nE, nL, nD,
      droppedLowLm = nQ - nQL, droppedContained = nC)
    result.onRelease = () => all.unpersist()
    result
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
