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

  /** Train the model AND return it with the slim assignment — the
    * form maintenance needs: the centroid set is the reusable model,
    * the (doc_id, cluster) rows are one frozen-model projection of it.
    */
  private[graft] def clusterModel(docs: DataFrame, k: Int = 8, iters: Int = 5)
      : (Array[(Int, Array[Double])], DataFrame) = {
    val emb = HashEmbedder.embed(docs)
    val (cents, assigned) = Centroids.lloyd(emb, idCol = "doc_id", k = k, iters = iters)
    (cents, assigned.select(col("doc_id"), col("shard").cast(LongType).as("cluster")))
  }

  /** Map-only frozen-model assignment: hash-embed + nearest centroid,
    * no Lloyd pass — what `maintain` runs over NEW docs only.
    */
  private def assignFrozen(docs: DataFrame,
                           cents: Array[(Int, Array[Double])]): DataFrame =
    HashEmbedder.embed(docs)
      .select(col("doc_id"),
        Centroids.nearestShard(col("embedding"), cents.toSeq)
          .cast(LongType).as("cluster"))

  def clusterDocs(docs: DataFrame, k: Int = 8, iters: Int = 5): DataFrame = {
    val a = clusterModel(docs, k, iters)._2
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

  private def modelDir(d: String, k: Int, iters: Int): String =
    TextAnalysis.termIdxDir(d, s"-cluster-k$k-i$iters-v2")

  private def liveStamp(live: DataFrame): (Long, Long) = {
    val r = live.agg(count(lit(1)),
      coalesce(sum(size(split(col("text"), " ")).cast(LongType)), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Full train-and-persist: slim assignment, k-row sizes, the
    * centroid MODEL (what `maintain` assigns against), then meta LAST
    * (its presence certifies a complete write).
    */
  private def persistModel(s: SparkSession, dir: String, live: DataFrame,
                           stamp: (Long, Long), k: Int, iters: Int): Unit = {
    import s.implicits._
    val (cents, a) = clusterModel(live, k, iters)
    a.write.mode("overwrite").parquet(s"$dir/assign")
    writeSizes(s, dir)
    cents.toSeq.map { case (c, v) => (c.toLong, v.toSeq) }
      .toDF("cluster", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/model")
    s.createDataFrame(Seq(stamp)).toDF("n_docs", "sum_dl").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def writeSizes(s: SparkSession, dir: String): Unit =
    s.read.parquet(s"$dir/assign").groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/sizes")

  private def readModel(s: SparkSession, dir: String): Array[(Int, Array[Double])] =
    s.read.parquet(s"$dir/model").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  private[graft] def servedAssignments(s: SparkSession, d: String,
                                       k: Int = 8, iters: Int = 5): DataFrame = {
    val dir = modelDir(d, k, iters)
    // sizes live beside the appendable slim assignment (layout v2) so
    // maintain() can append rows without rewriting every row's
    // population; the served frame re-joins them broadcast-side
    def assigned = s.read.parquet(s"$dir/assign")
      .join(broadcast(s.read.parquet(s"$dir/sizes")), "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"))
    if (servedFresh.contains(dir)) return assigned
    val live = Tables.documents(s, d)
    val stamp = liveStamp(live)
    val fresh = scala.util.Try {
      val m = s.read.parquet(s"$dir/meta").head()
      m.getLong(0) == stamp._1 && m.getLong(1) == stamp._2
    }.getOrElse(false)
    if (!fresh) persistModel(s, dir, live, stamp, k, iters)
    servedFresh.add(dir)
    assigned
  }

  /** Maintenance ledger: how many docs the verb assigned or
    * re-assigned, and whether the centroid model itself moved.
    */
  case class ModelMaintenance(nNew: Long, nDocs: Long, retrained: Boolean)

  /** The staleness verbs for the served topic model — `maintain`/
    * `retrain` symmetry with the two maintained indexes, replacing
    * wholesale re-clustering on drift:
    *
    *  - `retrain = false` (default): FROZEN-MODEL append — docs the
    *    live table has that the assignment lacks are hash-embedded
    *    and routed to the nearest persisted centroid (map-only over
    *    the NEW docs only — the Lloyd pass is not re-run, centroids
    *    do not move, existing assignments are untouched). The
    *    production-classifier contract: the model is a versioned
    *    artifact, arrivals are scored against it, and re-training is
    *    an explicit decision, not a side effect of serving. Deletions
    *    are NOT handled incrementally (the assignment would go stale
    *    silently under a frozen meta) — a shrunken corpus fails
    *    loudly here and wants `retrain = true`.
    *  - `retrain = true`: warm-start Lloyd from the PERSISTED
    *    centroids ([[graft.vector.Centroids.lloydFrom]] — few
    *    iterations to re-converge, shard identities stable for mass
    *    that didn't move), full assignment rewrite. The drift-repair
    *    verb when append volume has moved the topic mass enough that
    *    frozen routing misleads quotas.
    *
    * Both end by re-stamping sizes + meta, so `servedAssignments`
    * serves the maintained artifact without a rebuild. Requires a
    * served model to exist (serve once first).
    */
  def maintainAssignments(s: SparkSession, d: String, k: Int = 8,
                          iters: Int = 5, retrain: Boolean = false,
                          retrainIters: Int = 2): ModelMaintenance = {
    import s.implicits._
    val dir = modelDir(d, k, iters)
    require(scala.util.Try(s.read.parquet(s"$dir/meta").head()).isSuccess,
      s"no served topic model at $dir — serve (or rebuild) before maintaining")
    val live = Tables.documents(s, d)
    val stamp = liveStamp(live)
    val cached = s.read.parquet(s"$dir/assign").select("doc_id")
    if (retrain) {
      // count BEFORE the overwrite below: `cached`'s resolved file
      // listing points at the pre-retrain part files
      val nOld = cached.count()
      val (cents, a) = Centroids.lloydFrom(HashEmbedder.embed(live),
        idCol = "doc_id", vecCol = "embedding",
        init = readModel(s, dir), iters = retrainIters)
      a.select(col("doc_id"), col("shard").cast(LongType).as("cluster"))
        .write.mode("overwrite").parquet(s"$dir/assign")
      writeSizes(s, dir)
      cents.toSeq.map { case (c, v) => (c.toLong, v.toSeq) }
        .toDF("cluster", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/model")
      s.createDataFrame(Seq(stamp)).toDF("n_docs", "sum_dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/meta")
      servedFresh.add(dir)
      ModelMaintenance(nNew = stamp._1 - nOld, nDocs = stamp._1,
        retrained = true)
    } else {
      val removed = cached.join(live.select("doc_id"), Seq("doc_id"), "left_anti").count()
      require(removed == 0L,
        s"$removed assigned docs no longer exist — incremental maintain is " +
          "append-only; deletions need retrain = true (or a rebuild)")
      val newDocs = live.join(cached, Seq("doc_id"), "left_anti")
      val nNew = newDocs.count()
      if (nNew > 0)
        assignFrozen(newDocs, readModel(s, dir))
          .write.mode("append").parquet(s"$dir/assign")
      writeSizes(s, dir)
      s.createDataFrame(Seq(stamp)).toDF("n_docs", "sum_dl").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/meta")
      servedFresh.add(dir)
      ModelMaintenance(nNew = nNew, nDocs = stamp._1, retrained = false)
    }
  }

  private def clusterQuery(s: SparkSession, d: String): DataFrame =
    servedAssignments(s, d)

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("text_cluster" -> (clusterQuery _))
  // Lloyd iterations are not SQL-expressible: rows-only by design,
  // spec-cross-checked (TopicClusterSpec)
  override val oracleSql: Map[String, String] = Map.empty
}
