package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The maintained incremental shingle index that
  * [[Dedup.incrementalVerdicts]]'s Scaladoc promises: the corpus-side
  * tables a continuously-fed dedup gate probes, PERSISTED once and
  * appended per accepted batch, so judging a new batch never
  * re-shingles (or even touches) the corpus text again.
  *
  * Layout under `path` (plain parquet, one `batch=<label>` partition
  * directory per ingested batch — the index IS data, so the store
  * inherits Spark's scan parallelism, and the label layout makes
  * writes IDEMPOTENT: a replayed batch overwrites its own directory
  * instead of appending duplicate rows):
  *  - `fp/`     (doc_id, fp)  content fingerprints — the exact-dup side
  *  - `sh/`     (doc_id, s)   df-capped trigram shingles — the near-dup side
  *  - `sizes/`  (doc_id, n)   capped-set sizes (Jaccard denominators)
  *  - `dfc/`    (s, df)       RAW document-frequency deltas, one delta
  *                            row-set per batch; the current df of a
  *                            shingle is the SUM over batch dirs
  *                            ([[compact]] folds them)
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
  * Consistency contract: SINGLE WRITER. [[append]] writes four tables
  * in sequence under the same batch label — a crash mid-append leaves
  * that batch partially visible (a doc with postings but no size row
  * is invisible to near-dup judging until healed), and RE-RUNNING the
  * same append heals it exactly: every write overwrites the batch's
  * own directory, so at-least-once delivery converges to exactly-once
  * index state. This is why the label, not SaveMode.Append, carries
  * the ingest — blind appends would double df counts and intersection
  * counts under replay and silently corrupt Jaccard.
  */
class ShingleIndex(spark: SparkSession, path: String,
                   maxDfFraction: Double = Dedup.DefaultMaxDfFraction,
                   dfCapFloor: Long = Dedup.DefaultDfCapFloor) {
  private val fpDir = s"$path/fp"
  private val shDir = s"$path/sh"
  private val szDir = s"$path/sizes"
  private val dfDir = s"$path/dfc"
  private val dirs = Seq(fpDir, shDir, szDir, dfDir)

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fpOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("fp"))

  /** Current df per shingle (per-batch delta rows summed). */
  private def dfNow(): DataFrame =
    spark.read.parquet(dfDir).groupBy("s").agg(sum("df").as("df"))

  private def nDocs(): Long = spark.read.parquet(fpDir).count()

  private def writeBatch(df: DataFrame, dir: String, label: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$label")

  /** Build the index from the initial corpus (label `base`) — the
    * one-time pass whose amortization every later [[judge]] enjoys.
    * Rebuilding clears all previously appended batches.
    */
  def build(corpus: DataFrame): Unit = {
    dirs.foreach(d => fs.delete(new Path(d), true))
    val sh = Dedup.shinglesOf(corpus).cache()
    writeBatch(sh.groupBy("s").agg(count(lit(1)).as("df")), dfDir, "base")
    val n = corpus.select("doc_id").distinct().count()
    val cap = math.max(dfCapFloor, math.ceil(n * maxDfFraction).toLong)
    val capped = sh.join(dfNow().filter(col("df") <= cap).select("s"), "s")
    writeBatch(capped, shDir, "base")
    writeBatch(spark.read.parquet(shDir).groupBy("doc_id").agg(count(lit(1)).as("n")),
      szDir, "base")
    writeBatch(fpOf(corpus), fpDir, "base")
    sh.unpersist()
  }

  /** Ingest an accepted batch under `label`: its fingerprints, df
    * deltas, and insert-time-capped shingles join the index;
    * subsequent batches are judged against corpus + everything
    * appended so far. Work is batch-explode + one df-table probe — no
    * corpus re-derivation. Idempotent per label (see class doc);
    * labels must be unique per logical batch (streaming callers pass
    * the micro-batch id).
    */
  def append(batch: DataFrame, label: String): Unit = {
    require(label != "base" && label.nonEmpty, s"reserved/empty batch label '$label'")
    val sh = Dedup.shinglesOf(batch).cache()
    writeBatch(sh.groupBy("s").agg(count(lit(1)).as("df")), dfDir, label)
    val cap = math.max(dfCapFloor,
      math.ceil((nDocs() + batch.select("doc_id").distinct().count()) * maxDfFraction).toLong)
    // df as of AFTER this batch's delta landed (the insert-time cap)
    val capped = sh.join(dfNow().filter(col("df") <= cap).select("s"), "s")
      .localCheckpoint(true)
    writeBatch(capped, shDir, label)
    writeBatch(capped.groupBy("doc_id").agg(count(lit(1)).as("n")), szDir, label)
    writeBatch(fpOf(batch), fpDir, label)
    sh.unpersist()
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(capped)
  }

  /** Verdict per batch doc — 'exact' (fingerprint already indexed),
    * 'near' (capped-shingle Jaccard >= threshold against an indexed
    * doc), else 'keep' — [[Dedup.incrementalVerdicts]]'s contract with
    * the corpus side served from the index. Eagerly materialized
    * (verdicts are batch-sized); internal caches are released before
    * returning, but the returned frame's checkpoint blocks are the
    * CALLER's to release once consumed
    * (`CheckpointInterop.unpersistCheckpoint`) — a long-lived stream
    * judging thousands of batches must, or blocks accumulate.
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
    val unionDf = dfNow()
      .join(bdf, Seq("s"), "full")
      .filter(coalesce(col("df"), lit(0L)) + coalesce(col("df_b"), lit(0L)) <= cap)
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

  /** Fold the per-batch df delta directories into one — run
    * periodically, like any LSM-ish compaction. Crash window: folded
    * directory written but stale delta directories not yet deleted →
    * those shingles double-count, which only TIGHTENS caps (judge-safe
    * direction); re-running compact heals.
    */
  def compact(): Unit = {
    val existing = fs.listStatus(new Path(dfDir))
      .filter(_.isDirectory).map(_.getPath.getName)
    val folded = dfNow().localCheckpoint(true)
    val label = s"compact${existing.length}"
    writeBatch(folded, dfDir, label)
    existing.filter(_ != s"batch=$label")
      .foreach(n => fs.delete(new Path(s"$dfDir/$n"), true))
    org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(folded)
  }
}
