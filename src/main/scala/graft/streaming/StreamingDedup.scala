package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the online twin of `dedup_exact`
  * for a document INGEST stream (a crawler or firehose feeding the
  * curation pipeline): fingerprint content, and emit only the first
  * occurrence of each fingerprint within the watermark horizon.
  *
  * Built on `dropDuplicatesWithinWatermark`, so the dedup state store
  * holds one entry per distinct fingerprint seen inside the watermark
  * and is evicted as event time advances — bounded state at any
  * stream rate, unlike a plain `dropDuplicates` whose state grows
  * forever. The horizon is the semantic knob: duplicates arriving
  * farther apart than `watermark` both survive and are left to the
  * batch dedup pass that closes the pipeline (exact dedup is cheap
  * there; the stream pass exists to cut obviously-duplicated volume
  * before it is stored).
  */
object StreamingDedup {

  /** Deduplicate `docs` (streaming DataFrame with `textCol` and event
    * time `tsCol`) by exact content fingerprint within the watermark.
    */
  def dedup(docs: DataFrame, tsCol: String = "ts", textCol: String = "text",
            watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // working column; output keeps the ingest schema
}
