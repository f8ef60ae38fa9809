package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

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
object Opq extends QueryModule {

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
    *
    * `center = false` drops the mean from the rotation, making it a
    * PURE LINEAR map `v -> R v` instead of the affine `v -> R(v - mu)`.
    * Both are isometries (L2 and neighbors preserved; codebooks absorb
    * the constant shift, so ADC quality is identical), but only the
    * linear form commutes with inner products — `<q, v> = <R q, R v>`
    * — which is what [[VectorStore]]'s residual-IVFADC scoring needs:
    * its approximate dot `<q, c_s> + <q, residual~>` evaluates the
    * second term in rotated space as `<R q, codes~>`, valid only with
    * no affine offset. The eigenvalue allocation is unchanged either
    * way (variances are translation-invariant).
    */
  def train(df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
            dim: Int = 64, numSubspaces: Int = 8, numCodes: Int = 16,
            iters: Int = 3, center: Boolean = true): Model = {
    val permuted = trainRotation(df, vecCol, dim, numSubspaces, center)
    val frame = Pca.project(df, permuted, vecCol, "__opq")
      .select(col(idCol), col("__opq"))
    val pq = ProductQuantizer.train(frame, idCol, "__opq", dim, numSubspaces, numCodes, iters)
    Model(permuted, pq)
  }

  /** Rotation + eigenvalue allocation alone (the OPQ half without the
    * codebooks) — for callers that train their own quantizer on the
    * rotated frame, e.g. `VectorStore` composing a GLOBAL rotation
    * with PER-SHARD codebooks.
    */
  def trainRotation(df: DataFrame, vecCol: String = "embedding", dim: Int = 64,
                    numSubspaces: Int = 8, center: Boolean = true): Pca.Model = {
    val fitted = Pca.fit(df, vecCol, k = dim)
    val pca = if (center) fitted
      else Pca.Model(new Array[Double](fitted.mean.length), fitted.components)
    val rotated = Pca.project(df, pca, vecCol, "__rot")
    val vars = rotated
      .select((0 until dim).map(j => var_pop(element_at(col("__rot"), j + 1)).as(s"v$j")): _*)
      .head()
    val perm = allocate(Array.tabulate(dim)(vars.getDouble), numSubspaces)
    Pca.Model(pca.mean, perm.map(pca.components))
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

  /** Driver query: OPQ-compressed knn — rotate, encode, ADC shortlist
    * in rotated space, exact re-rank to top-10 (the serving path
    * `VectorStore.build(opqRotate = true)` + compressed search runs,
    * flattened to one frame). The re-rank makes the result exact
    * whenever the shortlist covers the true neighbors, so the oracle
    * is plain exact-L2 knn SQL — the same contract as `vdb_knn_pq`,
    * here exercising the ROTATED codes end-to-end. Codebooks train on
    * a deterministic 20% sample (reference trains on 10%,
    * cluster.py:17). Query vector: vec_id 1 (vdb_knn_pq uses 0) so the
    * two compressed paths are checked on different neighborhoods.
    */
  private def knnOpq(s: SparkSession, d: String): DataFrame = {
    import graft.expressions.VectorExpressions.l2Dist
    val e = Tables.embeddings(s, d)
    // SERVED rotation + codebooks + codes (round 13): the per-call
    // rotate/allocate/Lloyd train — the slowest vector query on the
    // round-12 bench — persists once per corpus content
    // ([[ServedQuant.servedOpq]]); the query pays ADC + re-rank only.
    // Training is deterministic, so served == per-call bit-identically.
    val (m, codes) = ServedQuant.servedOpq(s, d, dim = 64,
      numSubspaces = 16, numCodes = 16, iters = 3)
    val q = e.filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val noSelf = e.filter(col("vec_id") =!= 1)
    val short = codes.filter(col("vec_id") =!= 1)
      .withColumn("adc", adcDistance(col("pq_codes"), q, m))
      .orderBy(asc("adc"), col("vec_id").asc).limit(256)
      .select("vec_id")
    noSelf.join(broadcast(short), Seq("vec_id"))
      .withColumn("dist", l2Dist(col("embedding").cast("array<double>"), typedlit(q.toSeq)))
      .orderBy(asc("dist"), col("vec_id").asc).limit(10)
      .select(col("vec_id"), round(col("dist"), 4).as("dist"))
  }

  private val knnOpqSql =
    """SELECT b.vec_id,
      |  ROUND(list_distance(b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 4) AS dist
      |FROM embeddings a JOIN embeddings b ON b.vec_id <> 1
      |WHERE a.vec_id = 1
      |ORDER BY list_distance(b.embedding::DOUBLE[], a.embedding::DOUBLE[]) ASC, b.vec_id
      |LIMIT 10""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("vdb_knn_opq" -> (knnOpq _))
  override val oracleSql: Map[String, String] = Map("vdb_knn_opq" -> knnOpqSql)

  /** Reconstruction in RAW space of OPQ codes — the inverse-rotation
    * twin of [[ProductQuantizer.decodeCol]]. A plain decode yields the
    * approximation in ROTATED space; consumers that mix it with raw
    * vectors (e.g. `recon = centroid + residual~` in
    * [[graft.streaming.StreamingSearch.scoreIvfCompressed]]) need
    * `R^T r~'` back in the original basis. Rather than decode-then-
    * rotate (a dim x dim matrix product per row), each codeword is
    * inverse-rotated ONCE driver-side into a full-dim partial vector
    * `u(m)(k) = R_m^T c(m)(k)`, and the row expression sums M array
    * lookups — the same lookup-sum shape ADC uses, map-only. The
    * mean does not participate: only valid for `center = false`
    * models (asserted), which is what [[VectorStore]] persists.
    */
  def decodeRawCol(codesCol: Column, m: Model): Column = {
    require(m.rotation.mean.forall(_ == 0.0),
      "decodeRawCol needs a pure-rotation (center = false) OPQ model")
    val dim = m.rotation.components.length
    val sub = m.pq.subDim
    // u(mm)(k)(i) = sum over this subspace's rotated dims j of
    // components(mm*sub + j)(i) * codeword(j)
    val book: Seq[Seq[Seq[Double]]] = (0 until m.pq.numSubspaces).map { mm =>
      (0 until m.pq.numCodes).map { k =>
        val cw = m.pq.centroids(mm)(k)
        (0 until dim).map { i =>
          var s = 0.0; var j = 0
          while (j < sub) { s += m.rotation.components(mm * sub + j)(i) * cw(j); j += 1 }
          s
        }
      }
    }
    (0 until m.pq.numSubspaces).map { mm =>
      element_at(typedlit(book(mm)), element_at(codesCol, mm + 1) + 1)
    }.reduce((a, b) => zip_with(a, b, _ + _))
  }
}
