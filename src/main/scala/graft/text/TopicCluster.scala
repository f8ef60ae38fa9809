package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryModule, Tables}
import graft.embed.HashEmbedder
import graft.vector.Centroids

/** Corpus topic clustering: deterministic KMeans over hash-embedded
  * documents — the "bucket the corpus by topic" stage a mixing
  * pipeline runs before per-topic sampling (and the clustering that
  * SemDeDup-style dedup routes through). No trained model needed:
  * [[HashEmbedder]] gives every doc a 64-d signed-hash vector in one
  * pass, and [[Centroids.lloyd]] is the deterministic, scale-shaped
  * KMeans used for IVF builds (map-only assignment per iteration,
  * shuffle volume one 64-d array per (cluster, task) — input-size
  * independent).
  *
  * Output is the per-doc assignment (doc_id, cluster) plus the
  * cluster population — deterministic end-to-end (deterministic init,
  * deterministic embedder) but not SQL-expressible (Lloyd iterations),
  * so the driver entry is rows-only; TopicClusterSpec proves planted
  * two-domain recovery, the partition property, and determinism.
  */
object TopicCluster extends QueryModule {

  def clusterDocs(docs: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val emb = HashEmbedder.embed(docs)
    val (_, assigned) = Centroids.lloyd(emb, idCol = "doc_id", k = k, iters = iters)
    val a = assigned.select(col("doc_id"), col("shard").cast(LongType).as("cluster"))
    // cluster populations: a k-row aggregate, broadcast back
    val sizes = a.groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
    a.join(broadcast(sizes), "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"))
  }

  private def clusterQuery(s: SparkSession, d: String): DataFrame =
    clusterDocs(Tables.documents(s, d))

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("text_cluster" -> (clusterQuery _))
  // Lloyd iterations are not SQL-expressible: rows-only by design,
  // spec-cross-checked (TopicClusterSpec)
  override val oracleSql: Map[String, String] = Map.empty
}
