package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the
  * greatest timestamp strictly before (or at, if `strict=false`) the
  * left timestamp, within the same `by` key.
  *
  * Implemented with the merge technique, not a join: tag and union the
  * two sides, sort per key by (ts, tag), and carry the last-seen right
  * payload forward with last(ignoreNulls) — ONE shuffle of
  * |L| + |R| rows and a linear pass, versus a range-join's quadratic
  * per-key blowup. This is the standard scalable as-of shape (same
  * cost as a sort-merge join) and is exactly how it should run on
  * 1000 executors: partitioned by key, sorted within partition.
  *
  * Strictness: at equal timestamps the right row sorts AFTER the left
  * row (tag 0 vs 1), so a strictly-earlier match is guaranteed; pass
  * strict=false to sort right rows first and allow same-instant
  * matches.
  */
object AsOfJoin {
  /** xxhash64 rejects MapType (analysis error) — a hash tie-break over
    * such a payload would fail the WHOLE join at analysis time. Walk
    * the type; unhashable payloads skip the tie-break instead.
    */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** @param payload right-side column to carry, in its NATIVE type
    *                 (aliased "asof_value"); last(ignoreNulls) works on
    *                 any type, so nothing is coerced. Hashable payload
    *                 types additionally get a deterministic tie-break
    *                 among right rows sharing (key, ts); a payload
    *                 containing a MapType (which xxhash64 rejects)
    *                 still joins, but same-(key, ts) ties among
    *                 DISTINCT map payloads resolve by shuffle order
    * @return left rows (all columns) + asof_value, unmatched rows dropped
    */
  def join(left: DataFrame, right: DataFrame, by: String, leftTs: String,
           rightTs: String, payload: Column, strict: Boolean = true): DataFrame = {
    val rightTag = if (strict) 1 else -1
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(0))
    val r = right.withColumn("__rv", payload)
      .select(col(by), col(rightTs).as("__ts"), lit(rightTag).as("__tag"), col("__rv"))
    val lCols = left.columns
    // the left side carries no __rv: allowMissingColumns fills it with
    // nulls OF THE RIGHT SIDE'S TYPE, so the payload keeps its own type
    val merged = l.select(Seq(col(by), col("__ts"), col("__tag")) ++
      lCols.filterNot(_ == by).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    // deterministic tie-break among right rows sharing (key, ts): the
    // payload hash orders them stably, so reruns/repartitions pick the
    // same asof_value (byte-identical payloads tie harmlessly — either
    // pick IS the same value). Without it, last() over an unordered
    // tie depends on the shuffle's intra-partition order. Unhashable
    // payload types (MapType anywhere in the tree) skip it — the join
    // must not fail at analysis over a determinism nicety.
    val tieBreak: Seq[Column] =
      if (hashable(r.schema("__rv").dataType)) Seq(xxhash64(col("__rv")).asc) else Nil
    val w = Window.partitionBy(by)
      .orderBy(col("__ts").asc +: col("__tag").asc +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    merged
      .withColumn("asof_value", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0 && col("asof_value").isNotNull)
      .select(lCols.map(col) :+ col("asof_value"): _*)
  }
}
