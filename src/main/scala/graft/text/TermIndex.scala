package graft.text

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.BatchedTable

/** Maintained inverted index for BM25 serving — the text-search
  * counterpart of [[graft.dedup.ShingleIndex]]: the corpus is
  * tokenized ONCE (build / per accepted batch), and a keyword query
  * probes postings instead of re-scanning document text. The one-shot
  * `text_bm25` query derives tf/dl/df/N in-plan per call — right for
  * one ad-hoc query, wrong for a serving path: at 100 TB every query
  * would pay a full corpus scan and agg. Here a query reads the
  * postings rows of ITS OWN terms (predicate pushdown over the
  * term-sorted layout prunes row groups) plus one tiny meta fold —
  * scan volume ∝ query-term df, corpus-size-independent for selective
  * terms.
  *
  * Layout under `path` ([[BatchedTable]] discipline — idempotent
  * per-label writes, replay exclusion, crash-safe folds):
  *  - `post/` (term, doc_id, tf, dl)  postings, denormalized with the
  *            doc length so scoring needs NO doc-table join (the
  *            classic IR index trade: a long per posting buys a
  *            corpus-sized join per query); written term-sorted so
  *            parquet row-group stats prune non-query terms
  *  - `meta/` (n_docs, sum_dl)        one row per batch; N and avgdl
  *            fold from these at query time
  *
  * Scoring parity: [[search]] reproduces the one-shot query's BM25
  * expression EXACTLY — same tokenization (space split), same
  * term-order float association (per-term contributions come back as
  * separate conditional sums and add left-to-right), same idf/tf
  * forms — so for any query where ≥ k docs match at least one term,
  * the index's top-k equals the one-shot top-k hash-exactly (the
  * registered `text_bm25_indexed` proves it against `text_bm25`'s own
  * oracle SQL). Docs matching NO query term never score here (they
  * score 0.0 in the one-shot and can pad its top-k only when fewer
  * than k docs match anything — standard IR semantics).
  *
  * Contracts shared with ShingleIndex: single writer; batch doc_ids
  * disjoint from indexed doc_ids; at-least-once retry of the LATEST
  * batch only (append is idempotent per label; pass the in-flight
  * label as `compact(keepLabel)` so a replay's `excludeLabel` reads
  * keep working).
  */
class TermIndex(spark: SparkSession, path: String) {
  private val postDir = s"$path/post"
  private val metaDir = s"$path/meta"
  private val dirs = Seq(postDir, metaDir)
  // the SAME constants the one-shot query scores with — the hash-exact
  // parity contract depends on them (and on the shared space-split
  // tokenization) staying identical, so there is exactly one definition
  private val (k1, b) = (TextAnalysis.bmK1, TextAnalysis.bmB)

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (term, doc_id, tf, dl) postings for a (doc_id, text) frame —
    * exactly `text_bm25`'s tokenization: split on single spaces, every
    * token a term, dl = token count.
    */
  private def postingsOf(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    docs.select(col("doc_id"), size(ws).cast(LongType).as("dl"),
        explode(ws).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      // term-sorted files: parquet row-group min/max on `term` lets a
      // query's isin() filter skip non-matching groups at scan time
      .repartition(col("term")).sortWithinPartitions("term")
      .select("term", "doc_id", "tf", "dl")
  }

  private def writeBatchOf(docs: DataFrame, label: String): Unit = {
    BatchedTable.writeBatch(postingsOf(docs), postDir, label)
    // meta last: it describes a fully-written batch
    val m = docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(split(col("text"), " ")).cast(LongType)), lit(0L)).as("sum_dl"))
    BatchedTable.writeBatch(m, metaDir, label)
  }

  /** Build from the initial corpus (label `base`); clears prior state. */
  def build(corpus: DataFrame): Unit = {
    // clear tmps too: a crashed fold's tmp would otherwise be
    // "recovered" into the fresh index by the first write
    dirs.foreach(d => BatchedTable.clearTable(fs, d))
    writeBatchOf(corpus, "base")
  }

  /** Ingest an accepted batch of NEW docs under `label` — idempotent
    * per label (overwrites its own partition directories).
    */
  def append(batch: DataFrame, label: String): Unit = {
    require(label != "base" && label != "compact0" && label.nonEmpty,
      s"reserved/empty batch label '$label'")
    writeBatchOf(batch, label)
  }

  /** BM25 top-k (doc_id, bm25) for a keyword query over everything
    * indexed. The plan: one postings scan FILTERED to the query's
    * terms (pushdown + row-group pruning), df per term from that same
    * filtered frame, N/avgdl from the meta fold (both broadcast-tiny),
    * per-doc fixed-term-order score assembly, TakeOrdered(k).
    * `excludeLabel` replays a batch against the pre-append index.
    */
  def search(terms: Seq[String], k: Int = 10,
             excludeLabel: Option[String] = None): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val post = BatchedTable.readIdx(spark, postDir, excludeLabel)
      .filter(col("term").isin(terms: _*))
    val meta = BatchedTable.readIdx(spark, metaDir, excludeLabel)
      .agg(sum("n_docs").cast(DoubleType).as("n"),
        sum("sum_dl").cast(DoubleType).as("sdl"))
    // df per term: postings rows are unique per (term, doc) across
    // batches (disjoint doc_ids), so df = filtered row count per term
    val dfs = post.groupBy("term").agg(count(lit(1)).cast(DoubleType).as("df"))
    val idf = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * (col("tf") * (k1 + 1.0)) /
      (col("tf") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / (col("sdl") / col("n"))))
    val scoredRows = post
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(meta))
      .withColumn("__c", contrib)
    // fixed-term-order sum: each term's contribution comes back as ONE
    // conditional-sum column (a single double per doc — no accumulation
    // order inside), then adds left-to-right in the caller's term
    // order — the same float association as the one-shot expression
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("__c"))).as(s"__s$i")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduce(_ + _)
    scoredRows.groupBy("doc_id")
      .agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score0", score)
      .orderBy(desc("score0"), asc("doc_id")).limit(k)
      .select(col("doc_id"), round(col("score0"), 4).as("bm25"))
  }

  /** Fold all per-batch directories into `batch=compact0` (+ the
    * optional in-flight `keepLabel`, carried verbatim) — the same
    * file-count maintenance and crash protocol as
    * `ShingleIndex.compact` ([[BatchedTable.foldDir]]).
    */
  def compact(keepLabel: Option[String] = None): Unit = {
    dirs.foreach(d => BatchedTable.recoverFold(fs, d))
    require(fs.exists(new Path(postDir)),
      s"compact: $postDir does not exist — index not built?")
    val folds: Seq[(String, () => DataFrame)] = Seq(
      postDir -> (() => BatchedTable.readIdx(spark, postDir, keepLabel)
        .select("term", "doc_id", "tf", "dl")
        .repartition(col("term")).sortWithinPartitions("term")),
      metaDir -> (() => BatchedTable.readIdx(spark, metaDir, keepLabel)
        .agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
          coalesce(sum("sum_dl"), lit(0L)).as("sum_dl"))))
    folds.foreach { case (d, mk) =>
      BatchedTable.foldDir(spark, fs, d, mk(), keepLabel)
    }
  }
}
