package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    * per-cluster mean via the single-buffer VectorSumAgg — the classic
    * scalable KMeans step (shuffle volume is one dim-length array per
    * (cluster, map task), independent of input size).
    *
    * Returns (centroids, assignments DataFrame with `shard` column).
    */
  def lloyd(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
            k: Int = 4, iters: Int = 5): (Array[(Int, Array[Double])], DataFrame) =
    lloydFrom(emb, idCol, vecCol, deterministicInit(emb, idCol, vecCol, k), iters)

  /** Lloyd's from an explicit warm-start centroid set — the refresh
    * path for an index whose contents have drifted since build
    * ([[VectorStore.refreshCentroids]]): starting from the serving
    * centroids converges in few iterations and keeps shard identities
    * stable for the mass that didn't move.
    */
  def lloydFrom(emb: DataFrame, idCol: String, vecCol: String,
                init: Array[(Int, Array[Double])],
                iters: Int): (Array[(Int, Array[Double])], DataFrame) = {
    var cents = init
    // iterated over `iters` times: keep the working set in memory
    val vecs = emb.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol)).cache()
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("shard", nearestShard(col(vecCol), cents))
      val means = assigned
        .groupBy("shard")
        .agg(graft.expressions.VectorSumAgg.vectorSum(col(vecCol)).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2).toDouble
          (r.getLong(0).toInt, r.getSeq[Double](1).map(_ / n).toArray)
        }
        .sortBy(_._1)
      // a cluster can go empty: keep its previous centroid
      val byId = means.toMap
      cents = cents.map { case (sid, old) => (sid, byId.getOrElse(sid, old)) }
    }
    // the iteration's collect()s are done with the cache: release it and
    // hand back a plain map-only projection over the source (recomputing
    // one scan beats leaking a pinned copy of the corpus in the executors)
    vecs.unpersist()
    val fresh = emb.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
    (cents, fresh.withColumn("shard", nearestShard(col(vecCol), cents)))
  }

  /** Array of the `nprobe` nearest shard ids as a pure projection —
    * the per-ROW twin of [[nearestShardsOf]], for routing a whole
    * DataFrame of query vectors without a driver round-trip.
    */
  def nearestShards(v: Column, cents: Seq[(Int, Array[Double])], nprobe: Int): Column =
    transform(
      slice(array_sort(array(cents.map { case (sid, c) =>
        struct(l2Dist(v, typedlit(c.toSeq)).as("d"), lit(sid).cast(LongType).as("s"))
      }: _*)), 1, nprobe),
      x => x.getField("s"))

  /** MLlib KMeans alternative (cluster.py's sklearn KMeans analogue):
    * battle-tested kmeans|| init and convergence checks, at the cost
    * of determinism across Spark versions. Use [[lloyd]] when the
    * oracle / reproducibility matters, this when quality-per-iteration
    * does.
    */
  def mllibKMeans(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
                  k: Int = 4, maxIter: Int = 20, seed: Long = 42L): (Array[(Int, Array[Double])], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = emb.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("features", array_to_vector(col(vecCol)))
    val model = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed).fit(feats)
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val assigned = model.transform(feats)
      .select(col(idCol), col(vecCol), col("prediction").cast("long").as("shard"))
    (cents, assigned)
  }
}
