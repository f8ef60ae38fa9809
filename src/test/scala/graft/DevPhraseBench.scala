package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-bench for the phrase occurrence-count projection:
  * the old per-anchor containment scan (`array_contains(pos1, p + 1)`
  * per position — O(occ·len) per doc) vs the shipped shifted
  * `array_intersect` (hash-set, O(len)) on the degenerate case the
  * rewrite targets: a phrase of two very COMMON terms, where every
  * doc carries long position arrays for both.
  * Usage: sbt "Test/runMain graft.DevPhraseBench"
  */
object DevPhraseBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "graft-phrasebench")
    spark.sparkContext.setLogLevel("WARN")
    // 500 docs x 1000 occurrences of the bigram "x y": pos arrays of
    // 1000 elements each, every anchor matches
    val frame = spark.range(500).select(col("id").as("doc_id"),
        sequence(lit(0), lit(1998), lit(2)).as("__pos0"),
        sequence(lit(1), lit(1999), lit(2)).as("__pos1"))
      .localCheckpoint(true)
    val oldCnt = size(filter(col("__pos0"), p =>
      array_contains(col("__pos1"), p + 1)))
    val newCnt = size(array_intersect(col("__pos0"),
      transform(col("__pos1"), q => q - 1)))
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      // warmup + 3 passes
      (0 to 3).foreach { p =>
        val t0 = System.nanoTime()
        val s = frame.select(sum(c)).head().getLong(0)
        val t = (System.nanoTime() - t0) / 1e9
        if (p > 0) println(f"[phrasebench] $name pass$p $t%7.3f s (sum=$s)")
      }
    }
    time("containment-scan", oldCnt)
    time("shifted-intersect", newCnt)
    spark.stop()
  }
}
