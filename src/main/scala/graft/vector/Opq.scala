package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parametric OPQ (Ge et al., "Optimized Product Quantization", CVPR
  * 2013 — the parametric variant): PQ's subspace quantizers waste
  * their code budget when dimensions are correlated or variance is
  * lopsided across subspaces. Rotate with PCA first (decorrelates
  * under the Gaussian assumption), then PERMUTE the rotated
  * dimensions so every subspace receives approximately equal total
  * variance — eigenvalue allocation, greedy on log-variance: a plain
  * PCA rotation without the permutation would dump all the energy
  * into the first subspace and make things WORSE than no rotation.
  *
  * Everything downstream is the existing machinery: the rotation +
  * permutation is a [[Pca.project]] projection with reordered
  * components (map-only, plan-literal), codebooks train with
  * [[ProductQuantizer.train]] on the rotated frame, and ADC scoring
  * is [[ProductQuantizer.adcDistance]] against the rotated query
  * (rotation is orthogonal, so L2 in rotated space IS L2 in raw
  * space — same neighbors, better codes).
  */
object Opq {

  /** rotation = PCA model with components already permuted by the
    * eigenvalue allocation; pq = codebooks trained in rotated space.
    */
  final case class Model(rotation: Pca.Model, pq: ProductQuantizer.Model)

  /** Greedy eigenvalue allocation: dims sorted by variance descending,
    * each assigned to the open subspace with the smallest running
    * log-variance sum. Returns newPosition -> rotatedDim, grouped so
    * positions [m*subDim, (m+1)*subDim) belong to subspace m.
    */
  private[graft] def allocate(variances: Array[Double], numSubspaces: Int): Array[Int] = {
    val subDim = variances.length / numSubspaces
    val order = variances.zipWithIndex.sortBy(-_._1)
    val sums = Array.fill(numSubspaces)(0.0)
    val buckets = Array.fill(numSubspaces)(List.empty[Int])
    order.foreach { case (v, dim) =>
      val open = (0 until numSubspaces).filter(m => buckets(m).length < subDim)
      val m = open.minBy(m => (sums(m), m))
      // log keeps the balance criterion multiplicative (the quantizer's
      // distortion scales with the variance PRODUCT per subspace);
      // +1e-12 guards a zero-variance dim
      sums(m) += math.log(v + 1e-12)
      buckets(m) ::= dim
    }
    buckets.flatMap(_.reverse)
  }

  /** Fit rotation + allocation + codebooks. `df` must carry `idCol`
    * (deterministic PQ seeding) and `vecCol`.
    */
  def train(df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
            dim: Int = 64, numSubspaces: Int = 8, numCodes: Int = 16,
            iters: Int = 3): Model = {
    val pca = Pca.fit(df, vecCol, k = dim)
    val rotated = Pca.project(df, pca, vecCol, "__rot")
    val vars = rotated
      .select((0 until dim).map(j => var_pop(element_at(col("__rot"), j + 1)).as(s"v$j")): _*)
      .head()
    val perm = allocate(Array.tabulate(dim)(vars.getDouble), numSubspaces)
    val permuted = Pca.Model(pca.mean, perm.map(pca.components))
    val frame = Pca.project(df, permuted, vecCol, "__opq")
      .select(col(idCol), col("__opq"))
    val pq = ProductQuantizer.train(frame, idCol, "__opq", dim, numSubspaces, numCodes, iters)
    Model(permuted, pq)
  }

  /** Encode vectors under the model's rotation: project + PQ-encode,
    * both pure projections.
    */
  def encode(df: DataFrame, m: Model, vecCol: String = "embedding"): DataFrame =
    ProductQuantizer.encode(
      Pca.project(df, m.rotation, vecCol, "__opq"), m.pq, "__opq").drop("__opq")

  /** Rotate a query into the model's space (driver-side, tiny). */
  def rotateQuery(q: Array[Double], m: Model): Array[Double] =
    m.rotation.components.map { c =>
      var s = 0.0; var i = 0
      while (i < q.length) { s += (q(i) - m.rotation.mean(i)) * c(i); i += 1 }
      s
    }

  /** ADC distance column for a raw-space query against OPQ codes. */
  def adcDistance(codesCol: Column, q: Array[Double], m: Model): Column =
    ProductQuantizer.adcDistance(codesCol, rotateQuery(q, m), m.pq)
}
