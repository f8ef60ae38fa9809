package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The per-batch parquet table discipline shared by the maintained
  * indexes ([[graft.dedup.ShingleIndex]], [[graft.text.TermIndex]]):
  * one `batch=<label>` partition directory per ingested batch, so
  *  - writes are IDEMPOTENT per label (a replayed batch overwrites its
  *    own directory instead of appending duplicate rows),
  *  - a replay can EXCLUDE its own label from reads (partition-pruned
  *    before any IO) to reproduce first-run results, and
  *  - periodic [[foldDir]] compaction bounds the file/footer count.
  *
  * Fold crash safety (the [[Compact]] tmp-swap protocol): the folded
  * copy is durable in a sibling `_<name>__compact_tmp` BEFORE the
  * live directory is touched; the one crash window (between delete
  * and rename) fails loudly — reads find no directory — and
  * [[recoverFold]] finishes the swap with one rename.
  */
private[graft] object BatchedTable {

  def writeBatch(df: DataFrame, dir: String, label: String): Unit = {
    // a crashed fold's delete-rename window leaves the live directory
    // missing and ALL its data in the tmp sibling. Writing first would
    // recreate a live dir holding only this batch — reads would score
    // a one-batch corpus instead of failing loudly, and the NEXT fold
    // (which clears stale tmps while the live dir exists) would then
    // delete the tmp holding everything. Finish the swap first.
    val fs = new Path(dir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    recoverFold(fs, dir)
    df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$label")
  }

  /** Remove a table AND its fold tmp — for build()-style resets, where
    * resurrecting a crashed fold's data would defeat the reset.
    */
  def clearTable(fs: FileSystem, dir: String): Unit = {
    fs.delete(new Path(dir), true)
    fs.delete(tmpFor(dir), true)
  }

  /** Read a batched table, optionally excluding one label (the `batch`
    * column comes from partition discovery, so the exclusion prunes
    * that directory before any IO).
    */
  def readIdx(spark: SparkSession, dir: String,
              excludeLabel: Option[String]): DataFrame = {
    val df = spark.read.parquet(dir)
    excludeLabel.fold(df)(l => df.filter(col("batch") =!= l))
  }

  def tmpFor(dir: String): Path = {
    val p = new Path(dir)
    new Path(p.getParent, s"_${p.getName}__compact_tmp")
  }

  /** Finish a fold that crashed between delete and rename: a directory
    * whose live copy is missing but whose tmp exists recovers with one
    * rename; anything else is a no-op.
    */
  def recoverFold(fs: FileSystem, dir: String): Unit = {
    val p = new Path(dir)
    val tmp = tmpFor(dir)
    if (!fs.exists(p) && fs.exists(tmp) && !fs.rename(tmp, p))
      throw new IllegalStateException(
        s"compact recovery: rename $tmp -> $dir failed; all data is in $tmp")
  }

  private def rwTmpFor(dir: String, label: String): Path =
    new Path(new Path(dir), s"_batch=${label}__rw_tmp")

  /** Finish (or discard) crashed [[rewriteBatch]] swaps: an orphan
    * `_batch=<label>__rw_tmp` whose live partition is missing holds
    * the rewrite's full output — one rename completes it; a tmp
    * sibling of an intact live partition is pre-swap debris (the live
    * originals stand) — delete it. Leading `_` keeps the tmp invisible
    * to partition discovery, so reads never see a half state.
    */
  def recoverRewrites(fs: FileSystem, dir: String): Unit = {
    val p = new Path(dir)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("_batch=") && name.endsWith("__rw_tmp")) {
        val live = new Path(p,
          s"batch=${name.stripPrefix("_batch=").stripSuffix("__rw_tmp")}")
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live)) throw new IllegalStateException(
            s"rewrite recovery: rename ${st.getPath} -> $live failed")
        } else if (!fs.delete(st.getPath, true)) throw new IllegalStateException(
          s"rewrite recovery: could not clear stale tmp ${st.getPath}")
      }
    }
  }

  /** Rewrite ONE batch partition in place — the per-partition sibling
    * of [[foldDir]]'s whole-table swap (reclaim-style maintenance that
    * touches only the partitions holding affected rows). `kept` may
    * read the partition being replaced: it is written DURABLY to the
    * tmp sibling while the live originals still stand, then the live
    * directory swaps out. Crash windows mirror foldDir's: before the
    * live delete, the tmp is debris ([[recoverRewrites]] clears it);
    * between delete and rename, re-running the mutation (which calls
    * recoverRewrites first) completes the swap — single-writer,
    * at-least-once, same as every mutation on a batched table.
    */
  def rewriteBatch(fs: FileSystem, dir: String, label: String,
                   kept: DataFrame): Unit = {
    val tmp = rwTmpFor(dir, label)
    if (fs.exists(tmp) && !fs.delete(tmp, true)) throw new IllegalStateException(
      s"rewrite: could not clear stale tmp $tmp; live partition untouched")
    kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val live = new Path(new Path(dir), s"batch=$label")
    if (fs.exists(live) && !fs.delete(live, true)) throw new IllegalStateException(
      s"rewrite: delete of $live failed; originals intact, rewrite at $tmp")
    if (!fs.rename(tmp, live)) throw new IllegalStateException(
      s"rewrite: rename $tmp -> $live failed; re-running the mutation recovers")
  }

  /** One directory's fold: write `folded` as `batch=compact0` (and the
    * kept label's rows, verbatim) durably into the tmp sibling, then
    * swap. `folded` must read from the LIVE directory — it is
    * materialized (checkpoint) before the live copy is touched.
    */
  def foldDir(spark: SparkSession, fs: FileSystem, dir: String,
              folded: DataFrame, keepLabel: Option[String]): Unit = {
    val p = new Path(dir)
    val tmp = tmpFor(dir)
    // debris from a crash DURING a previous tmp write (live copy still
    // intact in that window) — clear it before rebuilding. The return
    // value matters: a failed delete would let a stale batch partition
    // (e.g. a previous fold's keepLabel) ride through the swap and
    // resurrect rows the fold's output already contains.
    if (fs.exists(tmp) && !fs.delete(tmp, true)) throw new IllegalStateException(
      s"compact: could not clear stale tmp $tmp; live directory untouched")
    val f = folded.localCheckpoint(true)
    try f.write.mode(SaveMode.Overwrite).parquet(s"$tmp/batch=compact0")
    finally org.apache.spark.sql.graftshim.CheckpointInterop.unpersistCheckpoint(f)
    // the kept label rides into the new directory as its own
    // partition, byte-equivalent to its pre-compact state — both
    // writes are durable in tmp before the live directory is touched
    keepLabel.foreach { l =>
      spark.read.parquet(dir).filter(col("batch") === l).drop("batch")
        .write.mode(SaveMode.Overwrite).parquet(s"$tmp/batch=$l")
    }
    if (!fs.delete(p, true)) throw new IllegalStateException(
      s"compact: delete of $dir failed; originals intact, folded copy at $tmp")
    if (!fs.rename(tmp, p)) throw new IllegalStateException(
      s"compact: rename $tmp -> $dir failed; all data is in $tmp, " +
        "re-running compact() recovers")
  }
}
