package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each right POINT to every left
  * INTERVAL containing it — the join Spark has no native operator for
  * and naively plans as a broadcast-nested-loop (O(|L|·|R|) predicate
  * evaluations, a non-starter at corpus scale).
  *
  * Implemented with bucket blocking: the numeric domain is cut into
  * fixed `bucketWidth` buckets, each interval explodes into one row
  * per bucket it touches, each point lands in exactly ONE bucket, and
  * the match becomes a bucket equi-join + exact containment filter.
  * Because a point has a single bucket, every qualifying (interval,
  * point) pair meets in exactly one bucket — no duplicate pairs, no
  * post-join dedup. Cost: shuffle of |points| + Σ(span/W + 1) interval
  * rows on the bucket key, and each bucket's local join touches only
  * its own rows — the O(n·m) collapses to output-sized work. This is
  * the standard scalable interval-join shape (DBMSs call it a "binned"
  * or "grid" range join).
  *
  * Pick `bucketWidth` near the TYPICAL interval length: much smaller
  * multiplies the interval-side explode (span/W rows per interval);
  * much larger packs unrelated rows into the same bucket and the
  * containment filter does the discarding. Both degrade linearly, not
  * catastrophically. A bucket whose moment is covered by many
  * intervals concentrates those rows — that is output skew (the pairs
  * genuinely exist); AQE's skew-join split handles the shuffle side.
  *
  * Bounds are INCLUSIVE on both ends (SQL BETWEEN semantics); callers
  * wanting half-open windows pass end-1 (integer domains).
  */
object RangeJoin {

  /** Join `intervals` ([startCol, endCol], both inclusive, any integer
    * domain — epoch micros, sequence ids) with `points` (pointCol in
    * the same domain). Returns matched pairs carrying ALL columns of
    * both inputs (caller aliases collisions away beforehand).
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      startCol: String, endCol: String, pointCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val l = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val r = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    l.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
