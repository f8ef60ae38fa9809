package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.expressions.VectorExpressions._

/** Centroid computation and shard assignment — the Spark re-expression
  * of the reference's KMeans + nearest_shards routing
  * (cluster.py:6-38, compute_server.py:40-48).
  *
  * Assignment is a pure projection: the centroid table is tiny by
  * construction (k = shard count), so it travels as literals inside
  * the plan — no join, no shuffle, map-only at any data scale. This is
  * the Spark analogue of the reference broadcasting CENTROIDS to its
  * router process.
  */
object Centroids {

  /** k deterministic seed centroids: the k vectors with the lowest ids
    * (a seeded-init stand-in that the DuckDB oracle can reproduce).
    */
  def deterministicInit(emb: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding", k: Int = 4): Array[(Int, Array[Double])] =
    emb.orderBy(idCol).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .zipWithIndex.map { case (c, i) => (i, c) }

  /** `struct(metric, shard)` argmin over the centroid set, as one
    * codegen-friendly projection. Ties break to the lowest shard id
    * (struct ordering is lexicographic).
    */
  private def nearestStruct(v: Column, cents: Seq[(Int, Array[Double])],
                            metric: (Column, Column) => Column): Column =
    array_min(array(cents.map { case (sid, c) =>
      struct(metric(v, typedlit(c.toSeq)).as("d"), lit(sid).cast(LongType).as("s"))
    }: _*))

  /** Shard id of the nearest centroid (L2, reference routing metric). */
  def nearestShard(v: Column, cents: Seq[(Int, Array[Double])]): Column =
    nearestStruct(v, cents, l2Dist).getField("s")

  /** L2 distance to the nearest centroid. */
  def nearestDist(v: Column, cents: Seq[(Int, Array[Double])]): Column =
    nearestStruct(v, cents, l2Dist).getField("d")

  /** The `nprobe` shards whose centroids are nearest to a single query
    * vector — computed driver-side (k values), as the reference router
    * does per request.
    */
  def nearestShardsOf(q: Array[Double], cents: Seq[(Int, Array[Double])], nprobe: Int): Seq[Int] =
    cents.map { case (sid, c) =>
      var s = 0.0; var i = 0
      while (i < q.length) { val d = q(i) - c(i); s += d * d; i += 1 }
      (math.sqrt(s), sid)
    }.sortBy(identity).take(nprobe).map(_._2)

  /** Deterministic Lloyd's KMeans over a vector DataFrame.
    *
    * Per iteration: map-only assignment (centroids as literals), then
    * per-dimension mean via posexplode + partial-aggregated groupBy —
    * the classic scalable KMeans step (shuffle volume is k*dim rows
    * after map-side combine, independent of input size).
    *
    * Returns (centroids, assignments DataFrame with `shard` column).
    */
  def lloyd(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
            k: Int = 4, iters: Int = 5): (Array[(Int, Array[Double])], DataFrame) = {
    var cents = deterministicInit(emb, idCol, vecCol, k)
    // iterated over `iters` times: keep the working set in memory
    val vecs = emb.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol)).cache()
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("shard", nearestShard(col(vecCol), cents))
      val means = assigned
        .select(col("shard"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("shard", "pos").agg(avg("x").as("m"))
        .groupBy("shard")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("shard"), transform(col("pm"), _.getField("m")).as("centroid"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // a cluster can go empty: keep its previous centroid
      val byId = means.toMap
      cents = cents.map { case (sid, old) => (sid, byId.getOrElse(sid, old)) }
    }
    (cents, vecs.withColumn("shard", nearestShard(col(vecCol), cents)))
  }
}
