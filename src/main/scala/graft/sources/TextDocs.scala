package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Raw-text ingestion into the `documents` schema (doc_id, text,
  * source, n_chars) — the step before every curation pass when the
  * corpus arrives as files, not parquet.
  *
  * Two shapes:
  *  - [[readLines]]: newline-delimited corpora (one doc per line; the
  *    common crawl-dump / JSONL-adjacent layout). Splittable — a large
  *    file fans out across tasks at block granularity.
  *  - [[readFiles]]: one doc per FILE (books, transcripts). Uses
  *    `wholetext`, so each file is one task's row — fine for many
  *    medium files, wrong for one giant file.
  *
  * doc_id is `xxhash64(file, text)`: deterministic under re-runs and
  * re-partitioning (no zipWithIndex/monotonically_increasing_id, both
  * of which renumber on any input change and would resplit
  * train/test). Identical lines in the same file collide — by
  * construction they are byte-identical duplicates, exactly what
  * downstream exact dedup collapses anyway; cross-file copies keep
  * distinct ids so provenance survives until dedup decides.
  *
  * RANDOM collisions: 64-bit ids birthday-collide at corpus scale —
  * ~n²/2^65 expected pairs, ≈270 at 1e11 docs — silently conflating
  * two unrelated documents everywhere doc_id is the key (dedup
  * survivor joins, split assignment). Run [[idCollisions]] after a
  * large ingest; a nonzero count at unacceptable odds means moving to
  * a 128-bit id (md5 prefix pair) for that corpus.
  */
object TextDocs {

  private def shape(df: DataFrame): DataFrame =
    df.select(
      xxhash64(col("__file"), col("text")).as("doc_id"),
      col("text"),
      regexp_extract(col("__file"), "([^/]+)$", 1).as("source"),
      length(col("text")).cast(LongType).as("n_chars"))

  /** One document per line of every file under `path`. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    shape(spark.read.text(path)
      .select(col("value").as("text"), input_file_name().as("__file")))

  /** One document per file under `path` (wholetext). */
  def readFiles(spark: SparkSession, path: String): DataFrame =
    shape(spark.read.option("wholetext", "true").text(path)
      .select(col("value").as("text"), input_file_name().as("__file")))

  /** Post-ingest id-collision audit: rows sharing a doc_id with a
    * DIFFERENT text (same-text same-file duplicates are by-design).
    * One aggregation pass; run it after any ingest big enough for
    * birthday odds to matter (see class doc).
    */
  def idCollisions(docs: DataFrame): Long =
    docs.groupBy("doc_id")
      .agg(countDistinct(col("text")).as("__nt"))
      .filter(col("__nt") > 1).count()
}
