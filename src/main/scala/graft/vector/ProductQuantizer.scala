package graft.vector

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryModule, Tables}

/** Product quantization (PQ) — the compressed similarity-search path
  * at corpus scale (Jegou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each D-dim vector into M
  * subvectors, k-means each subspace into K centroids, and store each
  * vector as M small codes. At D=64, M=8, K=16 a 512-byte double
  * vector becomes 8 codes (4 bits each) — a ~100x footprint cut, which
  * at 100 TB is the difference between scanning the corpus and
  * scanning a compressed sketch of it.
  *
  * Query scoring never decompresses: per query, an M x K table of
  * partial squared-L2 distances is computed driver-side (tiny: M*K
  * doubles), shipped as plan literals, and the scan sums M array
  * lookups per row — asymmetric distance computation (ADC). The scan
  * is map-only + TakeOrdered: no shuffle beyond top-k.
  *
  * Training reuses [[Centroids.lloyd]] per subspace (deterministic
  * lowest-id init), so models, codes, and search results are stable
  * across runs — spec-checked recall against exact L2 knn.
  */
object ProductQuantizer extends QueryModule {

  /** centroids(m)(k) is the k-th codeword of subspace m. */
  final case class Model(subDim: Int, centroids: Array[Array[Array[Double]]]) {
    def numSubspaces: Int = centroids.length
    def numCodes: Int = centroids(0).length
  }

  /** A store's codebook set: one global model, or one model per IVF
    * shard. One global book models ALL shards' residual distributions
    * with the same M x K codewords; at high shard counts the standard
    * win is a LOCAL book per shard — each inverted list's residuals
    * are tighter than the global mixture, so the same code budget
    * spends on local structure (Jegou et al. 2011 §IV trains the
    * product quantizer on learning data per configuration; per-list
    * codebooks are the locally-adaptive variant).
    */
  sealed trait Books {
    def forShard(shard: Int): Model
    def isPerShard: Boolean
  }
  final case class GlobalBooks(model: Model) extends Books {
    def forShard(shard: Int): Model = model
    def isPerShard: Boolean = false
  }
  final case class PerShardBooks(models: Map[Int, Model]) extends Books {
    def forShard(shard: Int): Model = models(shard)
    def isPerShard: Boolean = true
  }

  /** Train one codebook per subspace over (a sample of) the corpus.
    * All M subspace k-means runs advance TOGETHER: each Lloyd
    * iteration is ONE job over (subspace, subvector) exploded rows —
    * M*iters driver round-trips would otherwise dominate wall time.
    *
    * The codebook reaches the executors as DATA (one broadcast row
    * holding the full M x K x subDim array), not as plan literals: the
    * generated code is then identical across iterations AND corpora,
    * so codegen compiles once per session — at M=16, K=16 the literal
    * form recompiled a ~4k-line projection every iteration, and
    * compilation, not data, dominated training. Assignment stays a
    * pure PROJECTION (argmin over the broadcast book via higher-order
    * array functions), so the only shuffle per iteration is the
    * (subspace, code) partial aggregate — <= M*K rows per map
    * partition, never corpus-volume. Argmin compares SQUARED L2
    * (same ordering as l2Dist) with ties to the lowest code id,
    * matching Centroids.nearestStruct. Init is deterministic: each
    * subspace seeds from the numCodes lowest-id vectors' subvectors,
    * mirroring Centroids.deterministicInit.
    */
  def train(emb: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
            dim: Int = 64, numSubspaces: Int = 8, numCodes: Int = 16,
            iters: Int = 3): Model = {
    require(dim % numSubspaces == 0, s"dim $dim not divisible into $numSubspaces subspaces")
    val spark = emb.sparkSession
    import spark.implicits._
    val sub = dim / numSubspaces
    val v = col(vecCol).cast("array<double>")
    val seeds = emb.orderBy(idCol).limit(numCodes)
      .select(v.as("v")).collect().map(_.getSeq[Double](0).toArray)
    require(seeds.length == numCodes,
      s"need >= $numCodes vectors to train $numCodes codewords; got ${seeds.length}")
    var cents: Array[Array[Array[Double]]] = Array.tabulate(numSubspaces) { m =>
      seeds.map(_.slice(m * sub, m * sub + sub))
    }
    val sliced = emb.select(posexplode(array((0 until numSubspaces).map(m =>
      slice(v, m * sub + 1, sub)): _*)).as(Seq("m", "sv"))).cache()
    for (_ <- 0 until iters) {
      // book(m)(k) = codeword; shipped as one broadcast row of data
      val bookDf = Seq(Tuple1(cents.map(_.map(_.toSeq).toSeq).toSeq)).toDF("__book")
      val myCodes = element_at(col("__book"), col("m") + 1)
      val sqDist = (cv: Column) => aggregate(
        zip_with(col("sv"), cv, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      val shard = array_min(transform(
        sequence(lit(0), lit(numCodes - 1)),
        k => struct(sqDist(element_at(myCodes, k + 1)).as("d"),
          k.cast(LongType).as("s")))).getField("s")
      val means = sliced.crossJoin(broadcast(bookDf))
        .withColumn("shard", shard)
        .groupBy("m", "shard")
        .agg(graft.expressions.VectorSumAgg.vectorSum(col("sv")).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = means.map { r =>
        val n = r.getLong(3).toDouble
        ((r.getInt(0), r.getLong(1).toInt), r.getSeq[Double](2).map(_ / n).toArray)
      }.toMap
      cents = Array.tabulate(numSubspaces) { m =>
        // an empty code keeps its previous centroid
        Array.tabulate(numCodes)(k => byKey.getOrElse((m, k), cents(m)(k)))
      }
    }
    sliced.unpersist()
    Model(sub, cents)
  }

  /** Per-shard training: one codebook per (shard, subspace), all
    * advancing together — each Lloyd iteration is still ONE job, now
    * over (shard, subspace, subvector) exploded rows, and the partial
    * aggregate is bounded by shards x M x K rows per map partition
    * (k-scale model rows, never corpus volume). `df` must carry
    * `shardCol`. Shards with fewer than `numCodes` rows seed from what
    * they have (codewords beyond the population keep duplicating the
    * last seed — harmless: codes never pick them over a closer one).
    */
  def trainPerShard(emb: DataFrame, shardCol: String = "shard",
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    dim: Int = 64, numSubspaces: Int = 8, numCodes: Int = 16,
                    iters: Int = 3): PerShardBooks = {
    require(dim % numSubspaces == 0, s"dim $dim not divisible into $numSubspaces subspaces")
    val spark = emb.sparkSession
    import spark.implicits._
    val sub = dim / numSubspaces
    val v = col(vecCol).cast("array<double>")
    val sh = col(shardCol).cast("int")
    // deterministic per-shard seeds: the numCodes lowest-id vectors OF
    // EACH SHARD (one bounded window job; shards x numCodes rows back)
    val seedRows = emb
      .select(sh.as("sh"), col(idCol), v.as("v"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh").orderBy(col(idCol))))
      .filter(col("rn") <= numCodes)
      .select("sh", "rn", "v").collect()
      .groupBy(_.getInt(0))
      .map { case (s, rows) =>
        s -> rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray)
      }
    val shardIds = seedRows.keys.toArray.sorted
    var cents: Map[Int, Array[Array[Array[Double]]]] = seedRows.map { case (s, seeds) =>
      // pad a small shard by repeating its last seed
      val padded = Array.tabulate(numCodes)(k => seeds(math.min(k, seeds.length - 1)))
      s -> Array.tabulate(numSubspaces)(m => padded.map(_.slice(m * sub, m * sub + sub)))
    }
    val sliced = emb.select(sh.as("sh"), posexplode(array((0 until numSubspaces).map(m =>
      slice(v, m * sub + 1, sub)): _*)).as(Seq("m", "sv"))).cache()
    for (_ <- 0 until iters) {
      // per-shard books ride as one broadcast frame keyed by shard;
      // the equi-join on sh replaces global training's crossJoin
      val bookDf = shardIds.toSeq
        .map(s => (s, cents(s).map(_.map(_.toSeq).toSeq).toSeq))
        .toDF("sh", "__book")
      val myCodes = element_at(col("__book"), col("m") + 1)
      val sqDist = (cv: Column) => aggregate(
        zip_with(col("sv"), cv, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      val code = array_min(transform(
        sequence(lit(0), lit(numCodes - 1)),
        k => struct(sqDist(element_at(myCodes, k + 1)).as("d"),
          k.cast(LongType).as("s")))).getField("s")
      val means = sliced.join(broadcast(bookDf), "sh")
        .withColumn("code", code)
        .groupBy("sh", "m", "code")
        .agg(graft.expressions.VectorSumAgg.vectorSum(col("sv")).as("vsum"),
          count(lit(1)).as("n"))
        .collect()
      val byKey = means.map { r =>
        val n = r.getLong(4).toDouble
        ((r.getInt(0), r.getInt(1), r.getLong(2).toInt), r.getSeq[Double](3).map(_ / n).toArray)
      }.toMap
      cents = shardIds.map { s =>
        s -> Array.tabulate(numSubspaces) { m =>
          Array.tabulate(numCodes)(k => byKey.getOrElse((s, m, k), cents(s)(m)(k)))
        }
      }.toMap
    }
    sliced.unpersist()
    PerShardBooks(cents.map { case (s, c) => s -> Model(sub, c) })
  }

  /** [[encode]] under per-shard books: the row's shard selects its
    * codebook through a BROADCAST equi-join (one row per shard holding
    * its M x K x subDim book as DATA), then the same argmin
    * projection. Books ride as data, not plan literals, so generated
    * code — and the codegen cache entry — is shard-count-independent:
    * per-shard books are the high-shard-count regime, where a
    * shards x M x K x subDim literal would grow the plan linearly
    * (the same rule train() follows for its iteration books). A left
    * join keeps rows whose shard has no book (codes come out null)
    * rather than silently dropping them; `VectorStore` guarantees
    * coverage at build time (padEmptyShards).
    */
  def encodePerShard(df: DataFrame, books: PerShardBooks,
                     shardCol: String = "shard",
                     vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val someModel = books.models.head._2
    val sub = someModel.subDim
    val bookDf = books.models.toSeq
      .map { case (s, m) => (s, m.centroids.map(_.map(_.toSeq).toSeq).toSeq) }
      .toDF("__bsh", "__book")
    val v = col(vecCol).cast("array<double>")
    df.join(broadcast(bookDf), col(shardCol).cast("int") === col("__bsh"), "left")
      .withColumn("pq_codes", array((0 until someModel.numSubspaces).map { m =>
        val codes = element_at(col("__book"), m + 1)
        val sv = slice(v, m * sub + 1, sub)
        val sqDist = (cv: Column) => aggregate(
          zip_with(sv, cv, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
        array_min(transform(
          sequence(lit(0), lit(someModel.numCodes - 1)),
          k => struct(sqDist(element_at(codes, k + 1)).as("d"),
            k.cast("int").as("s")))).getField("s")
      }: _*))
      .drop("__bsh", "__book")
  }

  /** [[adcDot]] under per-shard books: per-query lookup tables ride as
    * a map literal and the row's shard selects its table — still M
    * lookups + a sum per row. Callers should pass only the books of
    * the shards the query actually scans (`VectorStore.searchWhere`
    * passes its probed subset), keeping the literal probe-bounded
    * rather than shard-count-bounded.
    */
  def adcDotPerShard(codesCol: Column, shardCol: Column, q: Array[Double],
                     books: PerShardBooks): Column = {
    val tables: Map[Int, Seq[Seq[Double]]] = books.models.map { case (s, model) =>
      s -> (0 until model.numSubspaces).map { m =>
        model.centroids(m).map { c =>
          var acc = 0.0; var i = 0
          while (i < model.subDim) { acc += q(m * model.subDim + i) * c(i); i += 1 }
          acc
        }.toSeq
      }
    }
    val tabLit = typedlit(tables)
    val myTab = element_at(tabLit, shardCol.cast("int"))
    val someModel = books.models.head._2
    (0 until someModel.numSubspaces).map { m =>
      element_at(element_at(myTab, m + 1), element_at(codesCol, m + 1) + 1)
    }.reduce(_ + _)
  }

  /** Encode vectors to their per-subspace nearest-codeword ids — a
    * pure projection (codebooks ride as plan literals), map-only at
    * any scale.
    */
  def encode(df: DataFrame, model: Model, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("pq_codes", array((0 until model.numSubspaces).map { m =>
      val cents = model.centroids(m).zipWithIndex.map { case (c, k) => (k, c) }.toSeq
      Centroids.nearestShard(slice(v, m * model.subDim + 1, model.subDim), cents)
        .cast("int")
    }: _*))
  }

  /** ADC column: approximate squared L2 distance of each encoded row
    * to query `q`, as M literal-table lookups.
    */
  def adcDistance(codesCol: Column, q: Array[Double], model: Model): Column = {
    val tables: Array[Array[Double]] = Array.tabulate(model.numSubspaces) { m =>
      model.centroids(m).map { c =>
        var s = 0.0; var i = 0
        while (i < model.subDim) {
          val d = q(m * model.subDim + i) - c(i); s += d * d; i += 1
        }
        s
      }
    }
    (0 until model.numSubspaces).map { m =>
      element_at(typedlit(tables(m).toSeq), element_at(codesCol, m + 1) + 1)
    }.reduce(_ + _)
  }

  /** ADC inner-product column: approximate `<row, q>` as M literal-table
    * lookups of per-subspace `centroid . q_subvector` partial dots —
    * the cosine-metric twin of [[adcDistance]] (divide by the stored
    * exact row norm and `|q|` to get an approximate cosine, as
    * [[VectorStore]]'s compressed search does).
    */
  def adcDot(codesCol: Column, q: Array[Double], model: Model): Column = {
    val tables: Array[Array[Double]] = Array.tabulate(model.numSubspaces) { m =>
      model.centroids(m).map { c =>
        var s = 0.0; var i = 0
        while (i < model.subDim) { s += q(m * model.subDim + i) * c(i); i += 1 }
        s
      }
    }
    (0 until model.numSubspaces).map { m =>
      element_at(typedlit(tables(m).toSeq), element_at(codesCol, m + 1) + 1)
    }.reduce(_ + _)
  }

  /** [[adcDot]] when the query is a COLUMN, not a literal — the
    * declarative half of the exec's `AdcState` fast path
    * ([[graft.plans.ShardTopKJoin]]): build the per-query M·K lookup
    * table ONCE on the (small) query side as a flat array column, and
    * [[adcDotFromLut]] then scores each candidate pair with M
    * `element_at`s instead of a dim-length reconstruction dot. The
    * codebook rides as one M x K x subDim plan literal; the LUT build
    * costs M·K·subDim flops per query row — amortized over every
    * candidate that row meets in the join. An OPQ `rotation` (row
    * major, the store's R) is applied to the query column first
    * (⟨q, Rᵀd⟩ = ⟨Rq, d⟩ — same one-rotation trick as the exec),
    * costing dim² flops per query row, once.
    *
    * Entry layout matches the exec's ProbeState.lut: `lut[m·K + c] =
    * ⟨q_m, book[m][c]⟩` (0-based; `element_at` callers add 1).
    */
  def adcLutCol(qvCol: Column, model: Model,
                rotation: Option[Array[Array[Double]]] = None): Column =
    adcLutFromBook(qvCol,
      typedlit(model.centroids.map(_.map(_.toSeq).toSeq).toSeq),
      model.subDim, rotation)

  /** [[adcLutCol]] when the codebook itself is a COLUMN — the
    * per-shard form: each routed (query, shard) replica joins its
    * shard's book frame ([[codeBookFrame]]) and builds its LUT from
    * the joined book, so generated code stays shard-count-independent
    * (books are data, not plan literals). Same entry layout and
    * accumulation order as the literal-book twin.
    */
  def adcLutFromBook(qvCol: Column, bookCol: Column, subDim: Int,
                     rotation: Option[Array[Array[Double]]] = None): Column = {
    val qr = rotation match {
      case Some(r) =>
        transform(typedlit(r.map(_.toSeq).toSeq),
          row => aggregate(zip_with(row, qvCol, _ * _), lit(0.0), _ + _))
      case None => qvCol
    }
    flatten(transform(bookCol, (bm, m) => transform(bm, cw =>
      aggregate(
        zip_with(cw, slice(qr, m * subDim + 1, lit(subDim)), _ * _),
        lit(0.0), _ + _))))
  }

  /** Per-shard codebooks in CODE space as one (shard, __cbook) frame
    * to broadcast-join against routed queries — the LUT-building twin
    * of [[rawBookFrame]] (which pre-maps codewords into RAW space for
    * reconstruction; here the QUERY is rotated instead, so codewords
    * stay as trained). `__cbook(m)(k)(j)` = codeword (m, k) dim j.
    */
  def codeBookFrame(spark: SparkSession, books: PerShardBooks,
                    shardCol: String = "shard"): DataFrame = {
    import spark.implicits._
    books.models.toSeq
      .map { case (s, m) => (s.toLong, m.centroids.map(_.map(_.toSeq).toSeq).toSeq) }
      .toDF(shardCol, "__cbook")
  }

  /** The pair-loop half of [[adcLutCol]]: approximate `<row, q>` as M
    * lookups into the query row's LUT column. Pure codegen'd
    * arithmetic — no higher-order function, no per-pair allocation.
    * `init` seeds the accumulation (a residual store's per-shard
    * offset ⟨q, c_shard⟩) BEFORE the first lookup — the same
    * `s = off; s += lut(...)` order as the exec's Adc pair loop, so
    * the two paths' scores are bit-identical, not just close.
    */
  def adcDotFromLut(codesCol: Column, lutCol: Column, model: Model,
                    init: Column = lit(0.0)): Column =
    (init +: (0 until model.numSubspaces).map { m =>
      element_at(lutCol, lit(m * model.numCodes + 1) + element_at(codesCol, m + 1))
    }).reduce(_ + _)

  /** Reconstruct the quantized approximation of each row: the M
    * looked-up codewords concatenated — the decode half of the codec,
    * for diagnostics and code-only scoring (a compressed corpus scored
    * against reconstructions reads 16 ints per row instead of the raw
    * vector: [[graft.streaming.StreamingSearch.scoreIvfCompressed]]).
    * The full codebook rides as one M x K x subDim literal (a few KB).
    */
  def decodeCol(codesCol: Column, model: Model): Column = {
    val book = typedlit(model.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(transform(sequence(lit(0), lit(model.numSubspaces - 1)),
      m => element_at(element_at(book, m + 1), element_at(codesCol, m + 1) + 1)))
  }

  /** Per-shard codebooks pre-mapped driver-side into RAW-SPACE partial
    * vectors, as one (shard, __book) frame to broadcast-join against a
    * coded corpus: `__book(m)(k)(i)` is codeword (m, k)'s contribution
    * to raw dim i — zero-embedded into its subspace's dims, or
    * inverse-rotated (`R_m^T c`) when the store carries an OPQ
    * rotation. Reconstruction is then a uniform SUM of M dim-length
    * lookups regardless of rotation ([[rawDecodeFromBook]]). Books
    * ride as model-sized DATA, not plan literals, so generated code is
    * shard-count-independent. Shared by the streaming scorer
    * ([[graft.streaming.StreamingSearch.scoreIvfCompressedPerShard]])
    * and `VectorStore.evalRecall(compressed = true)`.
    */
  def rawBookFrame(spark: SparkSession, books: PerShardBooks,
                   rotation: Option[Array[Array[Double]]],
                   shardCol: String = "shard"): DataFrame = {
    import spark.implicits._
    val someModel = books.models.head._2
    val (m0, k0, sub) = (someModel.numSubspaces, someModel.numCodes, someModel.subDim)
    val dim = rotation.map(_.length).getOrElse(m0 * sub)
    def partials(model: Model): Seq[Seq[Seq[Double]]] =
      (0 until m0).map { mm =>
        (0 until k0).map { k =>
          val cw = model.centroids(mm)(k)
          rotation match {
            case Some(r) => (0 until dim).map { i =>
              var s = 0.0; var j = 0
              while (j < sub) { s += r(mm * sub + j)(i) * cw(j); j += 1 }
              s
            }
            case None => Seq.tabulate(dim)(i =>
              if (i >= mm * sub && i < (mm + 1) * sub) cw(i - mm * sub) else 0.0)
          }
        }
      }
    books.models.toSeq
      .map { case (s, model) => (s.toLong, partials(model)) }
      .toDF(shardCol, "__book")
  }

  /** Raw-space reconstruction from a [[rawBookFrame]]-joined row: the
    * sum of each code's pre-mapped partial vector (rotation, if any,
    * is already baked into the book).
    */
  def rawDecodeFromBook(codesCol: Column, bookCol: Column, numSubspaces: Int): Column =
    (0 until numSubspaces).map { mm =>
      element_at(element_at(bookCol, mm + 1), element_at(codesCol, mm + 1) + 1)
    }.reduce((a, b) => zip_with(a, b, _ + _))

  /** Top-k by ADC distance over an encoded corpus: map-only lookup sum
    * + TakeOrdered.
    */
  def search(encoded: DataFrame, q: Array[Double], model: Model, topK: Int = 10,
             idCol: String = "vec_id"): DataFrame =
    encoded
      .withColumn("adc_dist", adcDistance(col("pq_codes"), q, model))
      .orderBy(asc("adc_dist"), col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("adc_dist"))

  /** PQ-shortlist + exact re-rank — the standard production PQ shape:
    * the compressed scan's ADC picks `shortlist` candidates, only
    * those ids' RAW vectors are fetched (broadcast semi-join; at scale
    * this is the only decompressed IO), and the shortlist is re-ranked
    * with exact L2. With shortlist >> topK the result matches exact
    * knn — oracle-checked at every test SF for the driver query.
    */
  def searchRerank(encoded: DataFrame, raw: DataFrame, q: Array[Double], model: Model,
                   topK: Int = 10, shortlist: Int = 100,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.expressions.VectorExpressions._
    val short = search(encoded, q, model, shortlist, idCol).select(idCol)
    raw.join(broadcast(short), Seq(idCol))
      .withColumn("dist", l2Dist(col(vecCol).cast("array<double>"), typedlit(q.toSeq)))
      .orderBy(asc("dist"), col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("dist"))
  }

  /** Driver query: PQ-compressed knn for the standard query vector
    * (vec_id 0) — ADC shortlist of 256 from 16x16 codes (the test
    * embeddings are near-uniform, the hardest case for PQ separation:
    * 16 subspaces of 4 dims keep per-row quantization noise below the
    * neighbor gaps; the measured worst-case shortlist need across SFs
    * is 128, so 256 is a 2x margin), then exact re-rank to top-10. The
    * oracle is plain exact L2 knn SQL: the rerank provably reproduces
    * it whenever the shortlist covers the true neighbors (PqSpec
    * asserts the coverage).
    */
  private def knnPq(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    // SERVED codebook + codes (round 13): training — a deterministic
    // 20% sample through Lloyd, the reference trains KMeans on 10%,
    // cluster.py:17 — runs once per corpus content and persists
    // ([[ServedQuant.servedPq]], freshness-stamped); the query itself
    // is the serving cost only: ADC shortlist over the stored codes +
    // exact re-rank. Determinism makes served == per-call trained
    // bit-identically, and the re-rank keeps the top-10 independent
    // of codebook noise as long as the shortlist covers the true
    // neighbors (PqSpec asserts coverage at every SF).
    val (model, codes) = ServedQuant.servedPq(s, d, numSubspaces = 16)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val noSelf = e.filter(col("vec_id") =!= 0)
    searchRerank(codes.filter(col("vec_id") =!= 0),
        noSelf, q, model, shortlist = 256)
      .select(col("vec_id"), round(col("dist"), 4).as("dist"))
  }

  private val knnPqSql =
    """SELECT b.vec_id,
      |  ROUND(list_distance(b.embedding::DOUBLE[], a.embedding::DOUBLE[]), 4) AS dist
      |FROM embeddings a JOIN embeddings b ON b.vec_id <> 0
      |WHERE a.vec_id = 0
      |ORDER BY list_distance(b.embedding::DOUBLE[], a.embedding::DOUBLE[]) ASC, b.vec_id
      |LIMIT 10""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("vdb_knn_pq" -> (knnPq _))
  override val oracleSql: Map[String, String] = Map("vdb_knn_pq" -> knnPqSql)
}
