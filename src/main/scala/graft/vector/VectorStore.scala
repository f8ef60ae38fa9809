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
    */
  def get(id: Long): DataFrame =
    spark.read.parquet(vecDir).filter(col(idCol) === id)

  /** Per-shard id inventory (reference /list_ids). */
  def listIds(): DataFrame =
    spark.read.parquet(vecDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_vectors"), min(idCol).as("min_id"), max(idCol).as("max_id"))

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
