package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The maintained incremental shingle index that
  * [[Dedup.incrementalVerdicts]]'s Scaladoc promises: the corpus-side
  * tables a continuously-fed dedup gate probes, PERSISTED once and
  * appended per accepted batch, so judging a new batch never
  * re-shingles (or even touches) the corpus text again.
  *
  * Layout under `path` (all plain parquet — the index IS data, so the
  * store inherits Spark's scan parallelism and partition pruning):
  *  - `fp/`     (doc_id, fp)  content fingerprints — the exact-dup side
  *  - `sh/`     (doc_id, s)   df-capped trigram shingles — the near-dup side
  *  - `sizes/`  (doc_id, n)   capped-set sizes (Jaccard denominators)
  *  - `dfc/`    (s, df)       RAW document-frequency deltas, append-only;
  *                            the current df of a shingle is the SUM of
  *                            its rows ([[compact]] folds them)
  *
  * Per-batch cost model (the point of the index): [[judge]] explodes
  * ONLY the incoming batch's text; every corpus-side input is a scan
  * of these pre-shingled tables — the per-batch work is
  * batch-shingles × (equi-join probes into the index), never a
  * corpus-side explode. At 100 TB the sh/ table is big but compact
  * (post-cap shingle rows), and the join against it is the same
  * bounded candidate generation [[Dedup.incrementalVerdictsCached]]
  * runs — with its corpus half amortized to build time.
  *
  * Capping semantics vs the one-shot operator: the one-shot pass caps
  * over old ∪ new jointly. The index caps each doc's shingles AT
  * INSERT TIME against the df table as of that moment (batch deltas
  * included), and insert-time decisions are not retroactive — a
  * shingle that later crosses the cap keeps its existing postings
  * until a rebuild. That is the standard maintained-index trade
  * (tombstone-until-compaction posture); judge-time candidate
  * generation still applies the CURRENT cap to the probe side, so a
  * newly-hot shingle stops generating new candidates immediately.
  *
  * Delivery contract: append-only parquet is at-least-once under
  * retries, same as the streaming sink it serves — replayed fp/sh
  * rows are harmless for judging (semi-join / distinct-pair
  * semantics); df deltas can double-count under replay, which only
  * tightens caps. Single writer, like [[graft.vector.VectorStore]].
  */
class ShingleIndex(spark: SparkSession, path: String,
                   maxDfFraction: Double = Dedup.DefaultMaxDfFraction,
                   dfCapFloor: Long = Dedup.DefaultDfCapFloor) {
  private val fpDir = s"$path/fp"
  private val shDir = s"$path/sh"
  private val szDir = s"$path/sizes"
  private val dfDir = s"$path/dfc"

  private def fpOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))

  /** Current df per shingle (delta rows summed). */
  private def dfNow(): DataFrame =
    spark.read.parquet(dfDir).groupBy("s").agg(sum("df").as("df"))

  private def nDocs(): Long = spark.read.parquet(fpDir).count()

  /** Build the index from the initial corpus — the one-time pass whose
    * amortization every later [[judge]] enjoys.
    */
  def build(corpus: DataFrame): Unit = {
    val sh = Dedup.shinglesOf(corpus).cache()
    val dfc = sh.groupBy("s").agg(count(lit(1)).as("df"))
    dfc.write.mode(SaveMode.Overwrite).parquet(dfDir)
    val n = corpus.select("doc_id").distinct().count()
    val cap = math.max(dfCapFloor, math.ceil(n * maxDfFraction).toLong)
    val capped = sh.join(
      spark.read.parquet(dfDir).filter(col("df") <= cap).select("s"), "s")
    capped.write.mode(SaveMode.Overwrite).parquet(shDir)
    spark.read.parquet(shDir).groupBy("doc_id").agg(count(lit(1)).as("n"))
      .write.mode(SaveMode.Overwrite).parquet(szDir)
    fpOf(corpus).write.mode(SaveMode.Overwrite).parquet(fpDir)
    sh.unpersist()
  }

  /** Append an accepted batch: its fingerprints, df deltas, and
    * insert-time-capped shingles join the index; subsequent batches
    * are judged against corpus + everything appended so far. Work is
    * batch-explode + one df-table probe — no corpus re-derivation.
    */
  def append(batch: DataFrame): Unit = {
    val sh = Dedup.shinglesOf(batch).cache()
    val bdf = sh.groupBy("s").agg(count(lit(1)).as("df"))
    bdf.write.mode(SaveMode.Append).parquet(dfDir)
    val cap = math.max(dfCapFloor,
      math.ceil((nDocs() + batch.select("doc_id").distinct().count()) * maxDfFraction).toLong)
    // df as of AFTER this batch's delta landed (the insert-time cap)
    val capped = sh.join(dfNow().filter(col("df") <= cap).select("s"), "s")
      .localCheckpoint(true)
    capped.write.mode(SaveMode.Append).parquet(shDir)
    capped.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .write.mode(SaveMode.Append).parquet(szDir)
    fpOf(batch).write.mode(SaveMode.Append).parquet(fpDir)
    sh.unpersist()
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(capped)
  }

  /** Verdict per batch doc — 'exact' (fingerprint already indexed),
    * 'near' (capped-shingle Jaccard >= threshold against an indexed
    * doc), else 'keep' — [[Dedup.incrementalVerdicts]]'s contract with
    * the corpus side served from the index. Eagerly materialized
    * (verdicts are batch-sized); internal caches are released before
    * returning.
    */
  def judge(batch: DataFrame, threshold: Double = 0.8): DataFrame = {
    val (v, caches) = judgeFrame(batch, threshold)
    val out = v.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  /** The lazy plan behind [[judge]] plus its caches — exposed for the
    * spec's plan assertions (no corpus-side explode: the only Generate
    * is the batch's own shingling; corpus inputs are index scans).
    */
  private[graft] def judgeFrame(batch: DataFrame,
                                threshold: Double): (DataFrame, Seq[DataFrame]) = {
    val bsh = Dedup.shinglesOf(batch).cache()
    val bIds = batch.select("doc_id")
    val exactDup = fpOf(batch)
      .join(spark.read.parquet(fpDir).select("fp").distinct(), Seq("fp"), "left_semi")
      .select(col("doc_id")).withColumn("__exact", lit(1L))
    // judge-time cap over the union: index df (compact probe) + this
    // batch's own df — a shingle that went hot since its insert stops
    // producing candidates NOW, even before any rebuild re-caps it
    val cap = math.max(dfCapFloor,
      math.ceil((nDocs() + batch.select("doc_id").distinct().count()) * maxDfFraction).toLong)
    val bdf = bsh.groupBy("s").agg(count(lit(1)).as("df_b"))
    val unionDf = spark.read.parquet(dfDir).groupBy("s").agg(sum("df").as("df_c"))
      .join(bdf, Seq("s"), "full")
      .filter(coalesce(col("df_c"), lit(0L)) + coalesce(col("df_b"), lit(0L)) <= cap)
      .select("s")
    val bCapped = bsh.join(unionDf, "s")
    val bSizes = bCapped.groupBy("doc_id").agg(count(lit(1)).as("na"))
    val inter = bCapped.as("a")
      .join(spark.read.parquet(shDir).as("b"), col("a.s") === col("b.s"))
      .groupBy(col("a.doc_id").as("id_new"), col("b.doc_id").as("id_old"))
      .agg(count(lit(1)).as("i"))
    val jac = col("i").cast(DoubleType) / (col("na") + col("nb") - col("i"))
    val nearDup = inter
      .join(bSizes.withColumnRenamed("doc_id", "id_new"), "id_new")
      .join(spark.read.parquet(szDir)
        .select(col("doc_id").as("id_old"), col("n").as("nb")), "id_old")
      .filter(jac >= threshold)
      .select(col("id_new").as("doc_id")).distinct().withColumn("__near", lit(1L))
    val verdicts = bIds
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__exact").isNotNull, "exact")
          .when(col("__near").isNotNull, "near")
          .otherwise("keep").as("verdict"))
    (verdicts, Seq(bsh))
  }

  /** Fold the df delta rows (one per appended batch per shingle) into
    * one row each — run periodically, like any LSM-ish compaction.
    */
  def compact(): Unit = {
    val folded = dfNow().localCheckpoint(true)
    folded.write.mode(SaveMode.Overwrite).parquet(dfDir)
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(folded)
  }
}
