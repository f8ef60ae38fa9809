package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions._
import graft.vector.Centroids

/** Streaming vector search: a stream of query vectors scored against a
  * static corpus — the online half of the reference's /search endpoint
  * re-expressed as a stream-static join (supported natively by
  * Structured Streaming).
  *
  * Two pruning levels before any scoring:
  *  - [[score]] takes the shards a workload probes (`probeShards`);
  *    the filter lands on the corpus scan BEFORE the broadcast, so a
  *    VectorStore-layout corpus partition-prunes whole shard
  *    directories exactly like `VectorStore.search`.
  *  - [[scoreIvf]] routes EACH query to its own `nprobe` nearest
  *    shards (a pure projection against plan-literal centroids) and
  *    scores through a stream-static equi-join on the shard id — no
  *    cross join anywhere, so per-micro-batch work is
  *    |queries| x |probed shards' vectors|, not |queries| x |corpus|.
  *
  * Per-query top-k needs per-group ranking, which streaming append
  * mode can't window — so ranking happens per micro-batch in
  * foreachBatch, the standard pattern for micro-batch-local top-k.
  */
object StreamingSearch {

  /** Scored candidates for every (query x corpus-vector) pair, with
    * the corpus pre-filtered to `probeShards` when given (pass the
    * union of shards the query workload probes; empty = score all).
    */
  def score(queries: DataFrame, corpus: DataFrame,
            idCol: String = "id", vecCol: String = "vector",
            probeShards: Seq[Long] = Nil, shardCol: String = "shard"): DataFrame = {
    val pruned =
      if (probeShards.isEmpty) corpus
      else corpus.filter(col(shardCol).isin(probeShards: _*))
    queries
      .join(broadcast(pruned.select(col(idCol), col(vecCol).cast("array<double>").as("cv"))),
        expr("true"))
      .withColumn("score", cosineSim(col("qv"), col("cv")))
      .select(col("query_id"), col(idCol), col("score"))
  }

  /** IVF-routed scoring: each query probes only its `nprobe` nearest
    * shards. Routing is a map-only projection on the stream side
    * (centroids are plan literals, k of them); candidates come from an
    * equi-join on the shard id against a corpus that carries its shard
    * assignment (the `VectorStore` layout).
    *
    * SKEW: the equi-join's task grain is the shard id, so a hot shard
    * (over-populated, and attracting more query routes too) straggles
    * one task per micro-batch. `maxRowsPerTask > 0` salts the join via
    * [[graft.operators.SaltedJoin.joinByPopulation]] — the STATIC
    * corpus side partitions by a per-shard salt sized from its
    * population, the streamed query side replicates per probed shard's
    * salt (a projection after a broadcast join, so the plan stays
    * stream-static legal). Scores are result-invariant for any salt.
    * This hook matters MORE here than in batch: AQE (whose skew-split
    * covers a batch join's hot partition) does not run in streaming,
    * so an unsalted stream-static join has NO skew defense at all —
    * ScaleSmoke measures the difference on a planted hot shard.
    */
  def scoreIvf(queries: DataFrame, corpus: DataFrame,
               cents: Seq[(Int, Array[Double])], nprobe: Int = 1,
               idCol: String = "id", vecCol: String = "vector",
               shardCol: String = "shard", queryVecCol: String = "qv",
               maxRowsPerTask: Long = 0L): DataFrame = {
    val routed = queries.withColumn(shardCol,
      explode(Centroids.nearestShards(col(queryVecCol), cents, nprobe)))
    val side = corpus.select(col(shardCol).cast("long").as(shardCol),
      col(idCol), col(vecCol).cast("array<double>").as("cv"))
    val joined =
      if (maxRowsPerTask > 0L)
        graft.operators.SaltedJoin.joinByPopulation(side, routed, shardCol,
          maxRowsPerTask, saltOn = Some(col(idCol)))
      else routed.join(side, shardCol)
    joined
      .withColumn("score", cosineSim(col(queryVecCol), col("cv")))
      .select(col("query_id"), col(idCol), col("score"))
  }

  /** [[scoreIvf]] over a PQ-compressed corpus: candidates are scored
    * against the RECONSTRUCTED vector (shard centroid + decoded
    * residual for a residual-coded store), so the corpus side selects
    * only (shard, id, pq_codes) and column pruning leaves the raw
    * vectors on disk — at scale the streamed scan reads ~M ints per
    * row instead of 8·dim bytes. Scores carry quantization error;
    * follow with an exact re-rank of the per-query shortlist where
    * exactness matters (same recipe as `VectorStore.search
    * (compressed = true)`).
    */
  def scoreIvfCompressed(queries: DataFrame, corpus: DataFrame,
                         cents: Seq[(Int, Array[Double])],
                         model: graft.vector.ProductQuantizer.Model,
                         residual: Boolean, nprobe: Int = 1,
                         idCol: String = "id", codesCol: String = "pq_codes",
                         shardCol: String = "shard", queryVecCol: String = "qv",
                         rotation: Option[Array[Array[Double]]] = None): DataFrame = {
    val routed = queries.withColumn(shardCol,
      explode(Centroids.nearestShards(col(queryVecCol), cents, nprobe)))
    // an OPQ store's codes live in ROTATED space: reconstructing into
    // the raw basis needs the INVERSE rotation, or the centroid-plus-
    // residual sum below would mix two bases and score garbage.
    // decodeRawCol bakes R^T into the looked-up codewords, so the row
    // cost stays M lookups + a sum — identical shape to plain decode.
    val decoded = rotation match {
      case Some(r) => graft.vector.Opq.decodeRawCol(col(codesCol),
        graft.vector.Opq.Model(
          graft.vector.Pca.Model(new Array[Double](r.length), r), model))
      case None => graft.vector.ProductQuantizer.decodeCol(col(codesCol), model)
    }
    val recon = if (!residual) decoded else {
      val ordered = cents.sortBy(_._1).map(_._2.toSeq).toSeq
      zip_with(element_at(typedlit(ordered), col(shardCol).cast("int") + 1),
        decoded, (c, r) => c + r)
    }
    val side = corpus.select(col(shardCol).cast("long").as(shardCol),
      col(idCol), col(codesCol))
    routed.join(side, shardCol)
      .withColumn("score", cosineSim(col(queryVecCol), recon))
      .select(col("query_id"), col(idCol), col("score"))
  }

  /** [[scoreIvfCompressed]] through the codes-native ADC fast path —
    * the declarative twin of [[graft.plans.ShardTopKJoin]]'s
    * `Metric.Adc` for plans the custom exec can't serve (a pure
    * stream transform is planned by the streaming engine, not routed
    * through foreachBatch where the batch-only exec lives). The
    * reconstruction variant pays a dim-length dot per candidate PAIR
    * (M lookups to decode + dim multiply-adds — compression saved IO
    * but not CPU); here each routed query replica builds its M·K
    * lookup table ONCE on the stream side (tiny per micro-batch, plus
    * the per-shard residual offset ⟨q, c_shard⟩ and |q|), and every
    * candidate costs M `element_at`s — a dim/M flop cut on the pair
    * loop that grows with embedding width (2.5–4.5× at dim=256 in the
    * exec's A/B; same arithmetic here).
    *
    * Scoring contract matches `VectorStore`'s compressed shortlist:
    * `score = (offset + Σ_m LUT[m][code_m]) / (vnorm · |q|)` with
    * zero-norm → 0.0 — the corpus side must carry the RAW vector's
    * norm (`normCol`; the reconstruction twin normalizes by the
    * reconstruction's own norm instead, so the two variants' scores
    * agree only up to quantization error — both are shortlist
    * approximations to be re-ranked exactly). Reads (shard, id,
    * codes, vnorm) only: column pruning leaves raw vectors on disk.
    */
  def scoreIvfCompressedAdc(queries: DataFrame, corpus: DataFrame,
                            cents: Seq[(Int, Array[Double])],
                            model: graft.vector.ProductQuantizer.Model,
                            residual: Boolean, nprobe: Int = 1,
                            idCol: String = "id", codesCol: String = "pq_codes",
                            normCol: String = "vnorm",
                            shardCol: String = "shard", queryVecCol: String = "qv",
                            rotation: Option[Array[Array[Double]]] = None): DataFrame = {
    import graft.vector.ProductQuantizer
    // per-replica probe state on the SMALL side: the flat M·K LUT
    // from the literal global book (rotated first for an OPQ store)
    val routed = queries
      .withColumn(shardCol,
        explode(Centroids.nearestShards(col(queryVecCol), cents, nprobe)))
      .withColumn("__lut",
        ProductQuantizer.adcLutCol(col(queryVecCol), model, rotation))
    adcScored(routed, corpus, model, residual, cents,
      idCol, codesCol, normCol, shardCol, queryVecCol)
  }

  /** The join + score assembly shared by BOTH streamed ADC scorers
    * (`routed` must already carry its `__lut` column — literal global
    * book or per-shard joined book): |q| and the raw-space residual
    * offset ⟨q_raw, c_shard⟩ compute once per replica (rotation never
    * touches the offset — the exec AdcState's split), the corpus side
    * reads (shard, id, codes, vnorm) only, and the per-pair score is
    * `(off + Σ LUT) / (vnorm · |q|)` with zero-norm → 0.0 in the
    * exec's accumulation order. ONE implementation so the two book
    * modes cannot drift from each other or from the exec contract.
    */
  private def adcScored(routed: DataFrame, corpus: DataFrame,
                        model: graft.vector.ProductQuantizer.Model,
                        residual: Boolean, cents: Seq[(Int, Array[Double])],
                        idCol: String, codesCol: String, normCol: String,
                        shardCol: String, queryVecCol: String): DataFrame = {
    import graft.vector.ProductQuantizer
    val withState = routed
      .withColumn("__qn", vecNorm(col(queryVecCol)))
      .withColumn("__off",
        if (!residual) lit(0.0)
        else {
          val ordered = cents.sortBy(_._1).map(_._2.toSeq).toSeq
          aggregate(
            zip_with(element_at(typedlit(ordered), col(shardCol).cast("int") + 1),
              col(queryVecCol), _ * _),
            lit(0.0), _ + _)
        })
    val side = corpus.select(col(shardCol).cast("long").as(shardCol),
      col(idCol), col(codesCol), col(normCol))
    val approx = ProductQuantizer.adcDotFromLut(col(codesCol), col("__lut"),
      model, init = col("__off"))
    withState.join(side, shardCol)
      .withColumn("score",
        when(col(normCol) === 0.0 || col("__qn") === 0.0, lit(0.0))
          .otherwise(approx / (col(normCol) * col("__qn"))))
      .select(col("query_id"), col(idCol), col("score"))
  }

  /** [[scoreIvfCompressedAdc]] for a PER-SHARD-codebook corpus: each
    * routed (query, shard) replica joins the broadcast code-space book
    * frame and builds ITS shard's M·K LUT (the query is rotated once
    * for an OPQ store — codewords stay as trained, so the book frame
    * is rotation-free data); the pair loop is still M `element_at`s.
    * Completes the streamed ADC surface: global books
    * ([[scoreIvfCompressedAdc]]) and per-shard books both score
    * codes-native, reconstruction twins retained for plans that want
    * raw-basis scores.
    */
  def scoreIvfCompressedPerShardAdc(queries: DataFrame, corpus: DataFrame,
                                    cents: Seq[(Int, Array[Double])],
                                    books: graft.vector.ProductQuantizer.PerShardBooks,
                                    residual: Boolean, nprobe: Int = 1,
                                    idCol: String = "id", codesCol: String = "pq_codes",
                                    normCol: String = "vnorm",
                                    shardCol: String = "shard", queryVecCol: String = "qv",
                                    rotation: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    import graft.vector.ProductQuantizer
    val someModel = books.models.head._2
    val cb = ProductQuantizer.codeBookFrame(corpus.sparkSession, books, shardCol)
    // per-replica LUT from the broadcast-joined per-shard book; the
    // scaffold below is the SAME adcScored assembly the global-book
    // scorer uses
    val routed = queries
      .withColumn(shardCol,
        explode(Centroids.nearestShards(col(queryVecCol), cents, nprobe)))
      .join(broadcast(cb), shardCol)
      .withColumn("__lut", ProductQuantizer.adcLutFromBook(col(queryVecCol),
        col("__cbook"), someModel.subDim, rotation))
      .drop("__cbook")
    adcScored(routed, corpus, someModel, residual, cents,
      idCol, codesCol, normCol, shardCol, queryVecCol)
  }

  /** [[scoreIvfCompressed]] for a PER-SHARD-codebook corpus
    * (`VectorStore.build(pqPerShard = true)`, optionally with
    * `opqRotate`). Each (shard, m, k) codeword is pre-mapped
    * driver-side into a RAW-SPACE partial vector — zero-embedded into
    * its subspace's dims, or inverse-rotated (`R_m^T c`) when the
    * store carries a rotation — so reconstruction is a uniform SUM of
    * M dim-length lookups regardless of rotation. The books ride as
    * one broadcast frame keyed by shard (shards x M x K x dim doubles
    * — model-sized DATA, not plan literals, so generated code is
    * shard-count-independent), and candidates pick their book through
    * the same equi-join that routes them.
    */
  def scoreIvfCompressedPerShard(queries: DataFrame, corpus: DataFrame,
                                 cents: Seq[(Int, Array[Double])],
                                 books: graft.vector.ProductQuantizer.PerShardBooks,
                                 residual: Boolean, nprobe: Int = 1,
                                 idCol: String = "id", codesCol: String = "pq_codes",
                                 shardCol: String = "shard", queryVecCol: String = "qv",
                                 rotation: Option[Array[Array[Double]]] = None): DataFrame = {
    val spark = corpus.sparkSession
    val m0 = books.models.head._2.numSubspaces
    // (shard, __book): codewords pre-mapped into raw space driver-side
    // (rotation baked in) — shared builder with the batch recall eval
    val bookDf = graft.vector.ProductQuantizer.rawBookFrame(spark, books,
      rotation, shardCol)
    val routed = queries.withColumn(shardCol,
      explode(Centroids.nearestShards(col(queryVecCol), cents, nprobe)))
    val side = corpus.select(col(shardCol).cast("long").as(shardCol),
      col(idCol), col(codesCol))
      .join(broadcast(bookDf), shardCol)
    val resid = graft.vector.ProductQuantizer.rawDecodeFromBook(
      col(codesCol), col("__book"), m0)
    val recon = if (!residual) resid else {
      val ordered = cents.sortBy(_._1).map(_._2.toSeq).toSeq
      zip_with(element_at(typedlit(ordered), col(shardCol).cast("int") + 1),
        resid, (c, r) => c + r)
    }
    routed.join(side, shardCol)
      .withColumn("score", cosineSim(col(queryVecCol), recon))
      .select(col("query_id"), col(idCol), col("score"))
  }

  /** Rank and truncate one micro-batch to top-k per query — call from
    * foreachBatch. Schema-generic (any extra columns ride along), at
    * the cost of a full per-query sort under the window; for the
    * canonical 3-column scorer output prefer [[topKPerQueryFused]].
    */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(desc("score"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** [[topKPerQuery]] through the bounded heap, for the canonical
    * (query_id, id: LONG, score) shape every scorer here emits:
    * partial aggregation ships ≤ k rows per (query, map partition) to
    * the merge instead of sorting every scored pair under the window,
    * and ties are DETERMINISTIC — (score desc, id asc), the batch
    * engine's convention, where the window form inherits sort-order
    * nondeterminism on equal scores. Same output columns plus the
    * same `rank` the window emits.
    */
  def topKPerQueryFused(scored: DataFrame, k: Int): DataFrame = {
    val idName = scored.columns(1)
    scored.groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK(col("score"), col(idName), k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as(idName),
        col("__e.score").as("score"), (col("__pos") + 1).cast("int").as("rank"))
  }
}
