package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}
import graft.expressions.VectorExpressions.{cosineSim, dotProduct}

/** PCA dimensionality reduction for embedding columns — the linear
  * twin of PQ's compression: where PQ shrinks BYTES per vector, PCA
  * shrinks DIMENSIONS, and the two compose (OPQ-style pipelines rotate
  * with PCA before quantizing). At 100 TB a 64->16 projection cuts
  * every downstream distance computation and shuffle payload 4x.
  *
  * Fitting delegates to MLlib's PCA estimator (exact covariance
  * eigendecomposition for d <= 65535 — one distributed Gram pass, tiny
  * driver-side eigensolve). One deliberate correction: Spark's
  * `PCAModel.transform` projects WITHOUT mean-centering (a documented
  * MLlib quirk), which shifts every projection by a constant pc'·mu
  * vector — harmless for L2 but NOT for cosine, which is not
  * translation-invariant. [[project]] therefore centers explicitly:
  * proj_j = <v - mu, pc_j>, as k codegen'd dot products over plan
  * literals — map-only at any scale, the same shape as PQ's encode.
  */
object Pca extends QueryModule {

  /** mean = column means mu; components(j) = the j-th principal axis
    * (unit length, descending explained variance).
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]])

  def fit(df: DataFrame, vecCol: String = "embedding", k: Int = 16): Model = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.stat.Summarizer
    val feats = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new PCA().setInputCol("features").setOutputCol("__p").setK(k).fit(feats)
    val mean = feats.select(Summarizer.mean(col("features")))
      .head().getAs[org.apache.spark.ml.linalg.Vector](0).toArray
    val pc = model.pc // d x k, column-major
    val comps = Array.tabulate(k)(j => Array.tabulate(mean.length)(i => pc(i, j)))
    Model(mean, comps)
  }

  /** Centered projection of `vecCol` onto the model's k axes, as a pure
    * projection (mean and components ride as plan literals).
    */
  def project(df: DataFrame, m: Model, vecCol: String = "embedding",
              outCol: String = "pca"): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedlit(m.mean.toSeq), (v, mu) => v - mu)
    df.withColumn(outCol,
      array(m.components.map(c => dotProduct(centered, typedlit(c.toSeq))): _*))
  }

  /** Driver query: cosine top-10 for query vec 0 in PCA-16 space.
    * Rows-only (eigenvectors have no DuckDB twin); PcaSpec proves the
    * semantics on clustered data — orthonormal axes, descending
    * variance, reduced-space knn recall against full-dim ground truth.
    */
  private def pcaKnn(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val m = fit(e, k = 16)
    val proj = project(e, m).select(col("vec_id"), col("pca"))
    val q = proj.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    proj.filter(col("vec_id") =!= 0)
      .withColumn("score", cosineSim(col("pca"), typedlit(q.toSeq)))
      .orderBy(desc("score"), col("vec_id").asc)
      .limit(10)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("vdb_pca_knn" -> (pcaKnn _))
  override val oracleSql: Map[String, String] = Map.empty
}
