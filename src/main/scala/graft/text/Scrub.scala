package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII scrubbing — the redaction pass every shipped training corpus
  * runs (emails and IPv4 addresses here; the pattern list is the
  * extension point). Pure map-side `regexp_replace`/`regexp_count`
  * projections: scan-bound at 100 TB, nothing shuffles, and the
  * codegen'd regex evaluation happens once per row per pattern.
  *
  * Patterns are written in the common subset of Java regex (Spark)
  * and RE2 (DuckDB oracle) — no backreferences, no lookaround — so
  * the oracle replays them verbatim.
  */
object Scrub {
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Adds `n_pii` (match count across patterns) and `text_scrubbed`
    * (emails → `<EMAIL>`, IPv4s → `<IP>`). Original column is kept;
    * callers drop it when shipping.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_pii",
        (regexp_count(col(textCol), lit(EmailPattern)) +
          regexp_count(col(textCol), lit(Ipv4Pattern))).cast(LongType))
      .withColumn("text_scrubbed",
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          Ipv4Pattern, "<IP>"))
}
