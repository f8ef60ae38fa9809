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

  /** The SERVED assignment — build-once-serve-many, the `servedIdx`
    * treatment applied to the topic model: the registered
    * `text_cluster` and `corpus_mix` queries were re-running
    * hash-embed + Lloyd per call, overstating served clustering cost
    * the same way per-query index rebuilds overstated text serving
    * (a mixing pipeline clusters once, then samples/packs/dashboards
    * against the SAME assignment many times — re-clustering between
    * reads would even break mix reproducibility if the corpus
    * drifted). One deterministic dir per (dataset, k, iters, layout
    * version); freshness = (doc count, token-count sum) against the
    * live table, persisted under `meta/` and checked once per JVM per
    * dir — stale or crashed caches rebuild. Output is byte-identical
    * to [[clusterDocs]] (everything deterministic), so the rows-only
    * spec contract is unchanged.
    */
  private val servedFresh =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Drop the per-JVM freshness memo — the content check re-runs at
    * each dir's next read. The memo assumes the session's datasets
    * don't mutate mid-JVM (servedIdx's contract); a caller that DOES
    * regenerate a dataset in-session invalidates first.
    */
  private[graft] def invalidateServed(): Unit = servedFresh.clear()
  private[graft] def servedAssignments(s: SparkSession, d: String,
                                       k: Int = 8, iters: Int = 5): DataFrame = {
    val dir = TextAnalysis.termIdxDir(d, s"-cluster-k$k-i$iters-v1")
    def assigned = s.read.parquet(s"$dir/assign")
    if (servedFresh.contains(dir)) return assigned
    val live = Tables.documents(s, d)
    val liveRow = live.agg(count(lit(1)),
      coalesce(sum(size(split(col("text"), " ")).cast(LongType)), lit(0L))).head()
    val fresh = scala.util.Try {
      val m = s.read.parquet(s"$dir/meta").head()
      m.getLong(0) == liveRow.getLong(0) && m.getLong(1) == liveRow.getLong(1)
    }.getOrElse(false)
    if (!fresh) {
      clusterDocs(live, k, iters)
        .write.mode("overwrite").parquet(s"$dir/assign")
      // meta LAST: its presence certifies a complete assign/ write
      s.createDataFrame(Seq((liveRow.getLong(0), liveRow.getLong(1))))
        .toDF("n_docs", "sum_dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/meta")
    }
    servedFresh.add(dir)
    assigned
  }

  private def clusterQuery(s: SparkSession, d: String): DataFrame =
    servedAssignments(s, d)

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("text_cluster" -> (clusterQuery _))
  // Lloyd iterations are not SQL-expressible: rows-only by design,
  // spec-cross-checked (TopicClusterSpec)
  override val oracleSql: Map[String, String] = Map.empty
}
