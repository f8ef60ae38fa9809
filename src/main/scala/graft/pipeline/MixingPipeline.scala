package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.text.TopicCluster

/** The "make me a training mix" flow as one ledgered call — the
  * sampling-side sibling of [[CurationPipeline]] (which cleans; this
  * SELECTS and SHAPES). Every stage is the already-registered operator
  * from its module, composed the way a 100 TB mixing job runs:
  *
  *   curated documents
  *     -> topic routing          ([[TopicCluster.clusterDocs]]: hash-embed
  *                                + deterministic Lloyd — k clusters)
  *     -> per-topic quotas       (temperature rule over topic token
  *                                mass: floor(target · sqrt-share),
  *                                min 1 — the tail-upweighting mix)
  *     -> in-topic DSIR pick     ([[PipelineOps.dsirWeights]] importance
  *                                weights + deterministic Gumbel top-k
  *                                per topic, bounded heaps — the most
  *                                target-like docs win each quota)
  *     -> token budget           (per-topic budget ∝ quota share,
  *                                cut in selection-key order)
  *     -> epoch shuffle          ([[PipelineOps.shuffleOrder]]: seeded
  *                                bucket/pos permutation, no global sort)
  *     -> sequence packing       ([[PipelineOps.packSequences]] per
  *                                topic into `capacity`-token windows)
  *
  * Scale shape: the corpus-sized work is the cluster pass (map-only
  * Lloyd iterations), the DSIR token pass (one explode collapsing to
  * per-(doc, bucket) counts), and the final packing over the SELECTED
  * docs only. Selection itself ships ≤ `targetDocs` rows per (topic,
  * map partition) through bounded heaps — never a corpus sort; the
  * budget window runs over the quota-bounded selection, not the
  * corpus. Everything is deterministic (deterministic embedder/init,
  * md5-seeded noise and shuffle), so re-running a mix reproduces it
  * byte-identically — the property a training run's data lineage
  * depends on.
  */
object MixingPipeline {

  /** Stage-by-stage accounting (counts are exact, from bounded
    * frames): `nInput` corpus docs, `nTopics` clusters with ≥ 1 doc,
    * `quotaTotal` summed per-topic quotas, `nSelected` docs picked by
    * the in-topic DSIR top-k (< quotaTotal when a topic has fewer
    * docs than its quota), `nAfterBudget`/`tokensAfterBudget` the
    * survivors of the token cut (= nSelected when no budget), and
    * `nWindows` packed sequences.
    */
  case class Ledger(nInput: Long, nTopics: Long, quotaTotal: Long,
                    nSelected: Long, tokensSelected: Long,
                    nAfterBudget: Long, tokensAfterBudget: Long,
                    nWindows: Long)

  /** @param selected (cluster, rank, doc_id, sel_key_x1e6, n_tokens) —
    *                  the budget survivors, the mix's doc manifest
    * @param order    (doc_id, bucket, pos) — the epoch's read order
    *                  over `selected`
    * @param packed   packSequences output over the selected docs,
    *                  windows keyed per topic
    */
  final class Result(val selected: DataFrame, val order: DataFrame,
                     val packed: DataFrame, ledgerThunk: () => Ledger) {
    /** Stage-by-stage accounting, computed ON DEMAND (r15): the ledger
      * costs ~6 count/agg actions, and a caller that only materializes
      * the mix output — the registered `corpus_mix` query consumes
      * `packed` alone — was paying for accounting it never read
      * (guide §1.2: don't compute things you throw away). First read
      * runs the counts once; the values are identical to the eager
      * form because every frame they aggregate is deterministic and
      * either checkpointed or cached until [[release]].
      */
    lazy val ledger: Ledger = ledgerThunk()
    /** Release the selection's checkpoint blocks once the mix has
      * been consumed — same contract as [[CurationPipeline.Result]]
      * (a one-shot batch run can skip; a caller mixing repeatedly in
      * one session must release or blocks accumulate).
      */
    def release(): Unit = onRelease()
    private[pipeline] var onRelease: () => Unit = () => ()
  }

  /** Deterministic Gumbel noise in micro-units for the DSIR
    * selection key — [[PipelineOps.dsirSample]]'s exact expression
    * (one definition would be ideal but the sample op inlines it;
    * keep the constants in lockstep with dsirSampleSql).
    */
  private def gumbelX1e6(id: Column): Column = {
    val u = (conv(substring(md5(concat(lit("dsir:"), id.cast("string"))), 1, 13),
      16, 10).cast("double") + 0.5) / 4503599627370496.0
    floor(-log(-log(u)) * 1000000.0).cast(LongType)
  }

  /** Run the mix. `targetPred` is DSIR's target-domain predicate over
    * the corpus columns (e.g. a curated-source marker);
    * `budgetTokens = None` skips the token cut. `clustered` supplies a
    * pre-computed (doc_id, cluster) assignment — the SERVED-model path
    * (`TopicCluster.servedAssignments`): a pipeline that mixes
    * repeatedly against one corpus clusters once, and re-running
    * Lloyd per mix would dominate the mix's cost with work whose
    * result never changes. Default None keeps the self-contained
    * cluster pass. `weights` likewise supplies pre-computed DSIR
    * weights (doc_id, dsir_x1e6) — the served-artifact path
    * ([[PipelineOps.servedDsirWeights]]); when set, `targetPred` is
    * unused (the predicate is baked into the artifact) and the mix
    * runs no token pass of its own beyond `slim`'s count projection.
    */
  def mix(spark: SparkSession, docs: DataFrame,
          k: Int = 8, targetDocs: Int = 100,
          targetPred: Column, budgetTokens: Option[Long] = None,
          capacity: Long = 512, seed: String = "ep0",
          lloydIters: Int = 5,
          clustered: Option[DataFrame] = None,
          weights: Option[DataFrame] = None): Result = {
    // 1. topic routing + per-doc token counts, one slim frame the
    // whole selection works over (text stays behind until packing).
    // CACHED: quotas, the selection join, and the ledger all act on
    // it — uncached, every action would re-split the corpus text and
    // re-run the assignment projection. Three longs per doc; released
    // before returning (the checkpointed selection carries on alone).
    val clusteredF = clustered.getOrElse(
        TopicCluster.clusterDocs(docs, k, lloydIters))
      .select("doc_id", "cluster")
    val slim = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .join(clusteredF, "doc_id")
      .cache()

    // 2. temperature quotas over per-topic token mass (the
    // sampleTemperature rule, stratum = topic): quota_c =
    // max(1, floor(target · sqrt(tokens_c) / Σ sqrt(tokens))) — the
    // same 1e-6 floor nudge, same broadcast-sized quota table
    val per = slim.groupBy("cluster").agg(sum("n_tokens").as("__t"))
    val quotas = per
      .crossJoin(broadcast(per.agg(sum(sqrt(col("__t"))).as("__tot"))))
      .select(col("cluster"),
        greatest(lit(1L),
          floor(lit(targetDocs.toDouble) * sqrt(col("__t")) / col("__tot") + 1e-6))
          .as("__quota"))

    // 3. in-topic DSIR Gumbel top-k: selection key = importance weight
    // + deterministic Gumbel noise (micro-nat integers — exact), heap
    // capped at targetDocs (quotas never exceed it), then the real
    // quota filter. ≤ targetDocs rows per (topic, map partition) on
    // the shuffle — the corpus is never sorted.
    // dsirWeights emits its own n_tokens (DSIR-bucket mass) — slim's
    // whitespace count is the packing/budget currency, keep that one.
    // The releasable form: dsir pins a per-(doc, bucket) cache the
    // weights plan re-reads; once the selection below is eagerly
    // checkpointed nothing references it, so repeated mixes in one
    // session must free it here (Result.release can't — the cache
    // isn't reachable from the returned frames).
    val (weightsAll, releaseWeights) = weights match {
      case Some(w) => (w, () => ())
      case None    => PipelineOps.dsirWeightsReleasable(docs, targetPred)
    }
    val keyed = weightsAll.select("doc_id", "dsir_x1e6")
      .withColumn("__sel", col("dsir_x1e6") + gumbelX1e6(col("doc_id")))
      .join(slim.select("doc_id", "cluster", "n_tokens"), "doc_id")
    // the heap key rides as double (TopKAgg's buffer type): micro-nat
    // keys are |v| ≪ 2^52, so the cast is exact and the (key desc,
    // id asc) heap order equals the integer order
    val selectedAll = keyed
      .withColumn("__kd", col("__sel").cast("double"))
      .groupBy("cluster")
      .agg(graft.expressions.TopKAgg.topK(col("__kd"), col("doc_id"), targetDocs).as("t"))
      .select(col("cluster"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("cluster"), (col("pos") + 1).cast(LongType).as("rank"),
        col("e.id").as("doc_id"))
      .join(broadcast(quotas), "cluster")
      .filter(col("rank") <= col("__quota"))
      .join(keyed.select(col("doc_id"), col("__sel").as("sel_key_x1e6"),
        col("n_tokens")), "doc_id")
      .select("cluster", "rank", "doc_id", "sel_key_x1e6", "n_tokens")
      .localCheckpoint(true) // quota-bounded: ≤ targetDocs rows/topic
    // the eager checkpoint above was the weights plan's last action
    releaseWeights()

    // 4. token budget, per topic ∝ quota share (windows run over the
    // bounded selection, partitioned per topic — never one global
    // sort): keep docs in selection order while the running total
    // stays within the topic's slice of the budget
    val afterBudget = budgetTokens match {
      case None => selectedAll
      case Some(budget) =>
        val qtot = quotas.agg(sum("__quota")).head().getLong(0)
        val shares = quotas.select(col("cluster"),
          (lit(budget) * col("__quota") / qtot).cast(LongType).as("__budget_c"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster").orderBy(desc("sel_key_x1e6"), asc("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        // checkpointed (selection-sized): severs the plan's reference
        // back through the quota table to the slim corpus frame, so
        // slim's cache can release before returning
        selectedAll
          .withColumn("__cum", sum("n_tokens").over(w))
          .join(broadcast(shares), "cluster")
          .filter(col("__cum") <= col("__budget_c"))
          .select("cluster", "rank", "doc_id", "sel_key_x1e6", "n_tokens")
          .localCheckpoint(true)
    }

    // 5-6. epoch order + packing over the selected docs only. The
    // packed manifest is checkpointed (windows-count rows): the
    // ledger's count and the caller's materialization would otherwise
    // each run the docs-join + packing windows
    val selDocs = docs.join(afterBudget.select("doc_id", "cluster"), "doc_id")
    val order = PipelineOps.shuffleOrder(afterBudget.select("doc_id"), seed = seed)
    val packed = PipelineOps.packSequences(selDocs, capacity, stratumCol = "cluster")
      .localCheckpoint(true)

    // ledger: exact counts, LAZY (computed at first Result.ledger
    // read) — the corpus pays the one cached slim pass (nInput reads
    // it, not the raw docs), everything else aggregates bounded frames
    // (selection / quota tables). slim stays cached until the ledger
    // runs (or release()), since nInput/nTopics read through it.
    val ledgerThunk = () => {
      val selAgg = selectedAll.agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L))).head()
      val budAgg = afterBudget.agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L))).head()
      val l = Ledger(
        nInput = slim.count(),
        nTopics = per.count(),
        quotaTotal = quotas.agg(coalesce(sum("__quota"), lit(0L))).head().getLong(0),
        nSelected = selAgg.getLong(0), tokensSelected = selAgg.getLong(1),
        nAfterBudget = budAgg.getLong(0), tokensAfterBudget = budAgg.getLong(1),
        nWindows = packed.count())
      // the selection is checkpointed and the outputs join raw `docs` —
      // nothing else reads slim once the counts are in hand
      slim.unpersist()
      l
    }
    val r = new Result(afterBudget, order, packed, ledgerThunk)
    r.onRelease = () => {
      slim.unpersist() // idempotent; covers the ledger-never-read path
      org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(selectedAll)
      if (!(afterBudget eq selectedAll))
        org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(afterBudget)
      org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(packed)
    }
    r
  }
}
