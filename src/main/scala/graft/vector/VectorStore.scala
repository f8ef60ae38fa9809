package graft.vector

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.VectorExpressions._

/** Spark-native re-expression of the reference's vector-store surface
  * (compute_server.py /store /get /search /set_centroids,
  * storage_server.py store/get/list_ids).
  *
  * The "cluster" is a parquet layout instead of N HTTP+SQLite
  * processes: vectors live under `path/vectors/shard=<id>/`, i.e. the
  * IVF inverted lists ARE parquet partitions. Search with
  * `nprobe < numShards` prunes whole directories before any IO — the
  * same routing decision the reference router makes, executed by the
  * parquet partition-pruning rule. At 100 TB each shard is itself
  * many splits, so parallelism within a probed shard is preserved.
  */
final class VectorStore(spark: SparkSession, path: String, numShards: Int = 4,
                        idCol: String = "id", vecCol: String = "vector") {
  private val vecDir = s"$path/vectors"
  private val centDir = s"$path/centroids"

  /** KMeans the corpus (reference test.py:41-48), persist centroids,
    * and write every vector to its nearest-centroid shard partition.
    */
  def build(vectors: DataFrame, iters: Int = 5): Unit = {
    val (cents, assigned) = Centroids.lloyd(vectors, idCol, vecCol, numShards, iters)
    setCentroids(cents)
    assigned.write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(vecDir)
  }

  /** Override the routing centroids (reference /set_centroids). */
  def setCentroids(cents: Array[(Int, Array[Double])]): Unit = {
    import spark.implicits._
    cents.toSeq.toDF("shard", "centroid")
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(centDir)
  }

  /** The routing table the reference serves at GET / . */
  def centroids(): Array[(Int, Array[Double])] =
    spark.read.parquet(centDir).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)

  /** Route new vectors to their nearest shard and append (reference
    * /store, one HTTP call per vector there — one distributed append
    * here).
    */
  def store(vectors: DataFrame): Unit = {
    val cents = centroids()
    vectors
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("shard", Centroids.nearestShard(col(vecCol), cents))
      .write.mode(SaveMode.Append).partitionBy("shard").parquet(vecDir)
  }

  /** Point lookup (reference /get/{id} scans every shard; here the id
    * predicate is pushed to parquet row-group stats in each shard).
    * Ids may be any orderable scalar — the reference keys vectors by
    * TEXT (storage_server.py:17-20), so string ids work unchanged.
    */
  def get(id: Any): DataFrame =
    spark.read.parquet(vecDir).filter(col(idCol) === lit(id))

  /** Per-shard id inventory (reference /list_ids). */
  def listIds(): DataFrame =
    spark.read.parquet(vecDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_vectors"), min(idCol).as("min_id"), max(idCol).as("max_id"))

  /** Upsert: replace-or-insert by id (reference /store is REPLACE INTO,
    * storage_server.py:38-50). Only the shard partitions that receive
    * new vectors are rewritten (dynamic partition overwrite) — at
    * 100 TB an upsert touches k directories, not the whole index.
    *
    * Consistency contract (same as [[delete]]): SINGLE WRITER, and no
    * crash atomicity across the two steps (partition overwrite, then
    * emptied-shard directory removal). A failure between them leaves a
    * stale shard directory whose ids resurrect on read; re-running the
    * same upsert/delete heals it. Concurrent readers of a store being
    * rewritten may see a partially-updated index. The reference has
    * the same posture (one SQLite writer per shard, no cross-shard
    * transaction).
    */
  def upsert(vectors: DataFrame): Array[Long] = {
    val cents = centroids()
    // cached: `touched` and the overwrite are two actions over the
    // caller's frame — a non-deterministic input (limit/sample without
    // ordering) must evaluate ONCE or a shard holding an old copy could
    // be missed from `touched`, leaving a stale duplicate id
    val incoming = vectors
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("shard", Centroids.nearestShard(col(vecCol), cents))
      .cache()
    try {
      // partition-column inference reads shard back as int: normalize
      val current = spark.read.parquet(vecDir)
        .withColumn("shard", col("shard").cast("long"))
      // an id's new vector may route to a different shard than its old
      // copy: rewrite both the destination shards and the shards that
      // currently hold the ids (otherwise the old copy survives)
      val touched = incoming.select("shard")
        .union(current.join(incoming.select(col(idCol)), Seq(idCol), "left_semi").select("shard"))
        .distinct().collect().map(_.getLong(0))
      val existing = current
        .filter(col("shard").isin(touched: _*))
        .join(incoming.select(col(idCol)), Seq(idCol), "left_anti")
      overwriteTouched(existing.unionByName(incoming), touched)
      touched
    } finally incoming.unpersist()
  }

  /** Overwrite the touched shard partitions with `result`. Dynamic
    * partition overwrite only rewrites partitions that receive rows, so
    * a touched shard with NO surviving rows would keep its stale
    * directory — delete those explicitly.
    */
  private def overwriteTouched(result: DataFrame, touched: Array[Long]): Unit = {
    val surviving = result.select("shard").distinct().collect()
      .map(_.get(0).asInstanceOf[Number].longValue()).toSet
    result.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(vecDir)
    val fs = new org.apache.hadoop.fs.Path(vecDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(surviving).foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$vecDir/shard=$s"), true)
    }
  }

  /** Delete by id (any scalar id type), rewriting only the shard
    * partitions that contain the ids. Single-writer, non-atomic across
    * steps — see [[upsert]]'s consistency contract.
    */
  def delete(ids: Seq[Any]): Array[Long] = {
    val all = spark.read.parquet(vecDir)
      .withColumn("shard", col("shard").cast("long"))
    val touched = all.filter(col(idCol).isin(ids: _*))
      .select("shard").distinct().collect().map(_.getLong(0))
    if (touched.isEmpty) return Array.empty
    overwriteTouched(
      all.filter(col("shard").isin(touched: _*) && !col(idCol).isin(ids: _*)), touched)
    touched
  }

  /** Continuous ingest: route and append each micro-batch of a vector
    * stream (the streaming twin of the reference's /store loop,
    * test.py:100-101 firing one HTTP POST per vector). Returns the
    * handle; caller stops it.
    */
  def streamStore(vectors: org.apache.spark.sql.DataFrame,
                  checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => store(batch) }
      .start()

  /** Cosine top-k over the `nprobe` nearest shards (reference /search).
    * Executes as: partition-prune to the probed shards -> map-only
    * scoring with the codegen'd CosineSim kernel -> TakeOrdered (local
    * per-partition heaps, no global sort).
    */
  def search(q: Array[Double], topK: Int = 5, nprobe: Int = 1): DataFrame = {
    val cents = centroids()
    val probe = Centroids.nearestShardsOf(q, cents, nprobe).map(_.toLong)
    spark.read.parquet(vecDir)
      .filter(col("shard").isin(probe: _*))
      .withColumn("score", cosineSim(col(vecCol), typedlit(q.toSeq)))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("shard").cast(LongType).as("shard"), col("score"))
  }
}
