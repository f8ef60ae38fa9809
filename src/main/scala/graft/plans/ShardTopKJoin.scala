package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanInterop
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.expressions.TopKHeap

/** Fused shard-equi-join + vector scoring + per-query bounded top-k.
  *
  * The declarative knn-JOIN plan — `corpus JOIN probes ON shard`,
  * score projection, `groupBy(query_id).agg(topK)` — materializes one
  * joined row per (corpus row, probing query) pair and walks each
  * through ObjectHashAggregate: an UnsafeRow write, a group-key
  * projection, and a hash-map lookup PER CANDIDATE PAIR. At the 5k×1M
  * serving join (nprobe=2, ~300 queries/shard) that is ~3·10⁸ pair
  * rows, and round 12 measured ~20 s of the leg's 33.6 s inside the
  * aggregate walk alone — more than the scoring itself.
  *
  * This operator is the (c)-tier answer (custom LogicalPlan + Strategy
  * + SparkPlan via SparkSessionExtensions): both children shuffle on
  * the join key exactly as before — `requiredChildDistribution` is the
  * same pair of ClusteredDistributions a SortMergeJoin would demand,
  * so EnsureRequirements/AQE plan the exchanges and the 100 TB "both
  * sides corpus-sized, nobody broadcasts" shape is preserved — but the
  * per-partition loop joins, scores, and folds into per-probe
  * [[TopKHeap]]s in ONE pass with no intermediate row, no group-key
  * projection, and no hash probe per pair (the probe list is resolved
  * once per CORPUS ROW, its heaps live on the probe entries
  * themselves). Output is the k-bounded partials (query_id, id,
  * score), ≤ k rows per (probe replica, partition) — the downstream
  * [[graft.expressions.TopKAgg]] merge then aggregates thousands of
  * rows, not hundreds of millions. Measured at ScaleSmoke's 1M×5k leg:
  * 36.2 s declarative → 10.6 s fused; planted hot shard with the salt
  * packed into the fused key: 9.3 s → 3.1 s.
  *
  * Four metrics — the first three mirror their expression twins
  * term-for-term so fused scores are BIT-IDENTICAL and the
  * DuckDB-oracle hash checks stay the proof; the fourth ([[Metric.Adc]],
  * see [[AdcState]]) trades last-ulp grouping identity for the IVFADC
  * lookup-table fast path, with exactness restored by the caller's
  * exact re-rank:
  *  - [[Metric.Cosine]] — `dot / (sqrt(na) · sqrt(nb))`, zero-norm →
  *    0.0, exactly [[graft.expressions.VectorKernels.cosine]]
  *    (hoisting the squared norms out of the pair loop reuses
  *    identical accumulations; it cannot change them);
  *  - [[Metric.DotOverNorm]] — corpus rows carry a PRECOMPUTED norm
  *    column (the compressed-serving shape: `vnorm` is the RAW
  *    vector's norm while the scored array is the ADC reconstruction,
  *    so the norm cannot be derived from the array): score =
  *    `dot / (norm · |q|)` with the `vnorm == 0 || qn == 0 → 0.0`
  *    guard, exactly the declarative `__approx` column;
  *  - [[Metric.L2]] — heap keyed on the NEGATED euclidean distance
  *    (so "best" stays "largest"), [[ranked]] re-negates on emission:
  *    ascending-distance top-k, ties id asc, value-equal to
  *    [[graft.expressions.VectorKernels.l2]].
  *
  * Reference anchor: the batched form of the reference's /search loop
  * (test.py:117-127) — every client vector gets its top-k against the
  * sharded store in one distributed plan.
  */
object ShardTopKJoin {

  /** Count of probe-residency warnings fired (the > 256 MB
    * per-partition probe-state guard below) — a LOCAL-MODE test hook:
    * tasks share the driver JVM there, so a smoke can assert the
    * warning fires on a pathological shape and stays silent on a sane
    * one. On a real cluster it counts per-executor (diagnostic only).
    */
  private[graft] val residencyWarnings =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Scoring mode — see the class doc for the exact formulas.
    * [[Metric.Ip]] (round 15) is the plain inner product — the MIPS
    * metric a trained-embedding recommender serves (unnormalized
    * dot, higher = better, no zero guard needed: a zero vector's dot
    * is naturally 0). Exactly [[graft.expressions.VectorKernels.dot]]
    * / DuckDB's `list_inner_product`.
    */
  object Metric {
    val Cosine = "cosine"
    val DotOverNorm = "dot_norm"
    val L2 = "l2"
    val Ip = "ip"
    val Adc = "adc"
    val all: Set[String] = Set(Cosine, DotOverNorm, L2, Ip, Adc)
  }

  /** Driver-resolved ADC serving state for [[Metric.Adc]] — the
    * codes-native compressed mode (round 13). [[Metric.DotOverNorm]]
    * scores a RECONSTRUCTED array per pair: dim multiply-adds, the
    * same flop count as raw scoring — compression saved IO but not
    * CPU. The classic IVFADC fast path is per-QUERY lookup tables:
    * LUT[m][k] = ⟨q_m, book[m][k]⟩ built once per probe (M·K·subDim
    * flops), then every candidate costs M table lookups instead of
    * dim multiply-adds — a dim/M flop cut on the pair loop (4× at
    * dim=64, M=16). The declarative plan cannot express it (the query
    * is a column, not a literal; the single-query path's adcDot
    * literals don't scale to a query FRAME) — this is exactly the
    * per-partition state a custom exec exists for.
    *
    * Semantics: approx = offset(shard) + Σ_m LUT[m][code_m], score =
    * approx / (vnorm · |q|) with the zero guards — the same TERMS as
    * the reconstruction dot, accumulated per-subspace instead of
    * element-sequential, so scores may differ from DotOverNorm's in
    * the last ulp (grouping, not math). Callers re-rank shortlists
    * exactly, so a covering shortlist gives identical final results
    * (spec-pinned); the ADC-mode spec mirrors the LUT math driver-side
    * for exactness.
    *
    *  - `books`: shard → codebooks [m][k][subDim] in CODE SPACE (the
    *    space vectors were encoded in — rotated for OPQ stores);
    *    global books under key -1.
    *  - `rotation`: OPQ rotation R (row-major); the probe is rotated
    *    ONCE per replica (⟨q, Rᵀd⟩ = ⟨Rq, d⟩) before the LUT build.
    *  - `residual`: shard → routing centroid (RAW space) for residual
    *    stores; contributes a per-probe CONSTANT ⟨q_raw, c_shard⟩ —
    *    one dot at setup, zero per-pair cost.
    *  - `packed` is stamped by [[ranked]] when salting packs
    *    (shard, salt) into the key; the exec unpacks shard = key/2¹⁶
    *    for book/offset resolution.
    */
  final case class AdcState(
      books: Map[Int, Array[Array[Array[Double]]]],
      rotation: Option[Array[Array[Double]]],
      residual: Option[Map[Int, Array[Double]]],
      packed: Boolean = false)

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match { case ArrayType(DoubleType, _) => true; case _ => false }

  /** Per-partition partial top-k candidates for `probes` against
    * `corpus`, both taken POSITIONALLY: probes = (query_id: LONG,
    * key: LONG, qv: ARRAY<DOUBLE>); corpus = (id: LONG, key: LONG,
    * vec: ARRAY<DOUBLE>) — plus a 4th `norm: DOUBLE` column for
    * [[Metric.DotOverNorm]]. Output (query_id, id, score) with ≤ k
    * rows per (probe row, partition); callers merge with a final
    * TopKAgg — see [[ranked]]. Null ids/keys/vectors are skipped
    * (inner-join semantics). `excludeSelf` drops candidates whose id
    * equals the probing query_id before they reach the heap. L2
    * scores are emitted NEGATED (heap order); [[ranked]] restores.
    */
  private def isIntArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }

  def partials(corpus: DataFrame, probes: DataFrame, k: Int,
               excludeSelf: Boolean,
               metric: String = Metric.Cosine,
               adc: Option[AdcState] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(Metric.all.contains(metric), s"unknown metric '$metric'")
    require((metric == Metric.Adc) == adc.isDefined,
      "Metric.Adc requires an AdcState (and only Metric.Adc takes one)")
    val ct = corpus.schema.fields.map(_.dataType)
    val wantNorm = metric == Metric.DotOverNorm
    val wantCodes = metric == Metric.Adc
    val corpusOk =
      if (wantCodes)
        ct.length == 4 && ct(0) == LongType && ct(1) == LongType &&
          isIntArray(ct(2)) && ct(3) == DoubleType
      else if (wantNorm)
        ct.length == 4 && ct(0) == LongType && ct(1) == LongType &&
          isDoubleArray(ct(2)) && ct(3) == DoubleType
      else
        ct.length == 3 && ct(0) == LongType && ct(1) == LongType &&
          isDoubleArray(ct(2))
    require(corpusOk, s"corpus must be (LONG, LONG, " +
      (if (wantCodes) "ARRAY<INT>, DOUBLE" else if (wantNorm) "ARRAY<DOUBLE>, DOUBLE"
       else "ARRAY<DOUBLE>") +
      s") positionally for metric $metric, got ${corpus.schema.simpleString}")
    val pt = probes.schema.fields.map(_.dataType)
    require(pt.length == 3 && pt(0) == LongType && pt(1) == LongType &&
      isDoubleArray(pt(2)),
      s"probes must be (LONG, LONG, ARRAY<DOUBLE>) positionally, got " +
        probes.schema.simpleString)
    val out = Seq(
      AttributeReference("query_id", LongType, nullable = false)(),
      AttributeReference("id", LongType, nullable = false)(),
      AttributeReference("score", DoubleType, nullable = false)())
    PlanInterop.ofRows(corpus.sparkSession,
      ShardTopKJoinNode(corpus.queryExecution.analyzed,
        probes.queryExecution.analyzed, k, excludeSelf, metric, adc, out))
  }

  /** The full knn-JOIN result: fused partials + the k-bounded
    * [[graft.expressions.TopKAgg]] merge (input ≤ k rows per probe
    * replica per partition — thousands of rows at serving scale).
    * Returns (query_id, rank, `idName`, score) with rank 1-based on
    * (score desc, id asc) — for [[Metric.L2]], score is the DISTANCE
    * and rank ascends it. `maxRowsPerTask > 0` bounds hot-shard
    * stragglers by salting the corpus side and replicating probes per
    * salt ([[graft.operators.SaltedJoin.joinByPopulation]]'s
    * discipline) with the (key, salt) pair PACKED into the single
    * fused join key — result-invariant: each matching pair still
    * meets exactly once.
    */
  def ranked(corpus: DataFrame, probes: DataFrame, k: Int,
             excludeSelf: Boolean, idName: String = "id",
             maxRowsPerTask: Long = 0L,
             saltOn: Option[Column] = None,
             precomputedSalts: Option[DataFrame] = None,
             metric: String = Metric.Cosine,
             adc: Option[AdcState] = None): DataFrame = {
    val (c, p) =
      if (maxRowsPerTask > 0L)
        packSalted(corpus, probes, maxRowsPerTask, saltOn, precomputedSalts)
      else (corpus, probes)
    rankedFrom(partials(c, p, k, excludeSelf, metric,
      adc.map(_.copy(packed = maxRowsPerTask > 0L))), k, metric, idName)
  }

  /** The TopKAgg merge + rank projection shared by [[ranked]] and
    * [[BroadcastTopKJoin.ranked]] — one tail so the two fused plans'
    * rank/score emission cannot drift.
    */
  private[plans] def rankedFrom(part: DataFrame, k: Int, metric: String,
                                idName: String): DataFrame = {
    val scoreOut =
      if (metric == Metric.L2) (-col("__e.score")).as("score")
      else col("__e.score").as("score")
    part.groupBy("query_id")
      .agg(graft.expressions.TopKAgg.topK(col("score"), col("id"), k).as("__t"))
      .select(col("query_id"), posexplode(col("__t")).as(Seq("__pos", "__e")))
      .select(col("query_id"), (col("__pos") + 1).cast(LongType).as("rank"),
        col("__e.id").as(idName), scoreOut)
  }

  /** Salt packing for the fused key: per-key salt count sized from the
    * corpus population (`saltc = ceil(n/maxRowsPerTask)`, broadcast
    * table), corpus rows land on `key·2¹⁶ + hash(salt basis) mod
    * saltc`, probes replicate to every salt of their key. Packing is
    * collision-free while keys are non-negative and < 2⁴⁷ and saltc ≤
    * 2¹⁶ — shard ids are small ints. Corpus columns beyond (id, key)
    * — the vector, a norm — pass through untouched.
    */
  private[graft] def packSalted(corpus: DataFrame, probes: DataFrame,
                                maxRowsPerTask: Long, saltOn: Option[Column],
                                precomputedSalts: Option[DataFrame])
      : (DataFrame, DataFrame) = {
    val cCols = corpus.columns.toSeq.map(col)
    val Seq(pId, pKey, pVec) = probes.columns.toSeq.map(col)
    val salts = precomputedSalts.getOrElse(
      graft.operators.SaltedJoin.populationSalts(
        corpus, corpus.columns(1), maxRowsPerTask))
    val basis = saltOn.getOrElse(cCols.head)
    // same null-safe <=> broadcast lookup on BOTH sides as
    // joinByPopulation, so ReuseExchange serves the probe side from
    // the corpus side's broadcast of the salts aggregate
    val c = corpus.join(broadcast(salts), cCols(1) <=> col("__jk"), "left")
      .select(cCols.head +:
        (cCols(1) * lit(65536L) +
          pmod(xxhash64(basis), coalesce(col("__saltc"), lit(1L)))).as("__pk") +:
        cCols.drop(2): _*)
    val p = probes.join(broadcast(salts), pKey <=> col("__jk"), "left")
      .select(pId, pKey, pVec,
        explode(sequence(lit(0L), coalesce(col("__saltc"), lit(1L)) - 1))
          .as("__salt"))
      .select(pId, (pKey * lit(65536L) + col("__salt")).as("__pk"), pVec)
    (c, p)
  }
}

/** Logical node: opaque to the optimizer (it references every child
  * column and produces its own output, so column pruning can't eat
  * the vector columns the way count()-forcing once did to the bench).
  * Children are POSITIONAL: left = (id, key, vec[, norm]), right =
  * (query_id, key, qv).
  */
case class ShardTopKJoinNode(left: LogicalPlan, right: LogicalPlan,
                             k: Int, excludeSelf: Boolean, metric: String,
                             adc: Option[ShardTopKJoin.AdcState],
                             output: Seq[Attribute]) extends BinaryNode {
  override def producedAttributes: AttributeSet = outputSet
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): ShardTopKJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule wiring [[ShardTopKJoinNode]] to its exec — injected by
  * [[graft.GraftExtensions]] (`injectPlannerStrategy`).
  */
object ShardTopKJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: ShardTopKJoinNode =>
      ShardTopKJoinExec(planLater(n.left), planLater(n.right),
        n.k, n.excludeSelf, n.metric, n.adc, n.output) :: Nil
    case _ => Nil
  }
}

/** One probe replica's serving state inside a partition: its query id,
  * materialized query vector, precomputed norm, and live heap. ADC
  * mode adds the per-probe lookup table (flat [m·K + code] layout),
  * its codeword count K, and the residual-centroid offset.
  */
private final class ProbeState(val qid: Long, val qv: Array[Double],
                               val sqrtNb: Double, val heap: TopKHeap,
                               val lut: Array[Double] = null,
                               val lutK: Int = 0,
                               val off: Double = 0.0)

/** The EXACT-metric pair loop shared by both fused execs — cosine
  * (squared norm once per corpus row, element order identical to
  * VectorKernels.cosine), the stored-norm dot (the compressed
  * reconstruction shape; `dotNorm` is the corpus row's norm column),
  * and negated L2. One implementation so the shuffle and broadcast
  * plans' scores cannot drift by accumulation order.
  */
private object ExactKernel {
  def offerAll(lst: java.util.ArrayList[ProbeState], id: Long,
               v: Array[Double], mCos: Boolean, mDot: Boolean,
               dotNorm: Double, exSelf: Boolean,
               mIp: Boolean = false): Long = {
    val n = v.length
    var na = 0.0
    var preNorm = 0.0
    if (mCos) {
      var i = 0
      while (i < n) { val x = v(i); na += x * x; i += 1 }
      preNorm = math.sqrt(na)
    } else if (mDot) {
      preNorm = dotNorm
    }
    var nPairs = 0L
    var j = 0
    val m = lst.size
    while (j < m) {
      val p = lst.get(j)
      if (!(exSelf && id == p.qid)) {
        val qv = p.qv
        if (qv.length != n) throw new IllegalArgumentException(
          s"vector kernel on mismatched dimensions: $n vs ${qv.length} " +
            "(ragged embedding row?)")
        var score = 0.0
        if (mCos) {
          var dot = 0.0
          var t = 0
          while (t < n) { dot += v(t) * qv(t); t += 1 }
          score = if (na == 0.0 || p.sqrtNb == 0.0) 0.0
            else dot / (preNorm * p.sqrtNb)
        } else if (mDot) {
          var dot = 0.0
          var t = 0
          while (t < n) { dot += v(t) * qv(t); t += 1 }
          score = if (preNorm == 0.0 || p.sqrtNb == 0.0) 0.0
            else dot / (preNorm * p.sqrtNb)
        } else if (mIp) {
          // plain inner product (MIPS): same element-sequential
          // accumulation as VectorKernels.dot — no normalization,
          // no guard
          var dot = 0.0
          var t = 0
          while (t < n) { dot += v(t) * qv(t); t += 1 }
          score = dot
        } else {
          // L2, negated so the max-heap keeps the NEAREST
          var s = 0.0
          var t = 0
          while (t < n) { val d = v(t) - qv(t); s += d * d; t += 1 }
          score = -math.sqrt(s)
        }
        p.heap.offer(score, id)
        nPairs += 1L
      }
      j += 1
    }
    nPairs
  }
}

/** The ADC probe setup and pair loop shared by BOTH fused execs
  * (shuffle [[ShardTopKJoinExec]] and broadcast
  * [[BroadcastTopKJoinExec]]) — one implementation so the two plans'
  * scores cannot drift by accumulation order.
  */
private object AdcKernel {

  /** Per-replica setup: rotate the query once (⟨q, Rᵀd⟩ = ⟨Rq, d⟩),
    * build the flat M·K LUT from the replica's shard book (global
    * fallback under key −1), and fold the residual-centroid offset
    * ⟨q_raw, c_shard⟩ — all once per replica, never per pair.
    */
  def probeState(qid: Long, qv: Array[Double], sqrtNb: Double, shard: Int,
                 st: ShardTopKJoin.AdcState, k: Int): ProbeState = {
    val book = st.books.getOrElse(shard,
      st.books.getOrElse(-1, throw new IllegalStateException(
        s"no ADC codebook for shard $shard")))
    val qr = st.rotation match {
      case Some(rot) =>
        val out = new Array[Double](rot.length)
        var ri = 0
        while (ri < rot.length) {
          val row = rot(ri)
          var s = 0.0; var j = 0
          while (j < qv.length) { s += row(j) * qv(j); j += 1 }
          out(ri) = s; ri += 1
        }
        out
      case None => qv
    }
    val mSub = book.length
    val kCodes = book(0).length
    val subDim = book(0)(0).length
    val lut = new Array[Double](mSub * kCodes)
    var m = 0
    while (m < mSub) {
      val bm = book(m)
      var c = 0
      while (c < kCodes) {
        val cw = bm(c)
        var s = 0.0; var j = 0
        while (j < subDim) { s += qr(m * subDim + j) * cw(j); j += 1 }
        lut(m * kCodes + c) = s; c += 1
      }
      m += 1
    }
    val off = st.residual match {
      case Some(cmap) =>
        val cent = cmap.getOrElse(shard, throw new IllegalStateException(
          s"no residual centroid for shard $shard"))
        var s = 0.0; var j = 0
        while (j < qv.length) { s += qv(j) * cent(j); j += 1 }
        s
      case None => 0.0
    }
    new ProbeState(qid, qv, sqrtNb, new TopKHeap(k), lut, kCodes, off)
  }

  /** The ADC pair loop for one corpus row against a replica list: M
    * lookups + adds per candidate. Returns the number of pairs
    * scored.
    */
  def offerAll(lst: java.util.ArrayList[ProbeState], id: Long,
               codes: Array[Int], vn: Double, exSelf: Boolean): Long = {
    var nPairs = 0L
    var j = 0
    val m = lst.size
    while (j < m) {
      val p = lst.get(j)
      if (!(exSelf && id == p.qid)) {
        val lut = p.lut
        val kC = p.lutK
        if (codes.length * kC != lut.length)
          throw new IllegalArgumentException(
            s"ADC codes/book mismatch: ${codes.length} codes vs " +
              s"${lut.length / kC} subspaces (mixed-build store?)")
        var s = p.off
        var mi = 0
        while (mi < codes.length) { s += lut(mi * kC + codes(mi)); mi += 1 }
        val score = if (vn == 0.0 || p.sqrtNb == 0.0) 0.0
          else s / (vn * p.sqrtNb)
        p.heap.offer(score, id)
        nPairs += 1L
      }
      j += 1
    }
    nPairs
  }
}

case class ShardTopKJoinExec(left: SparkPlan, right: SparkPlan,
                             k: Int, excludeSelf: Boolean, metric: String,
                             adc: Option[ShardTopKJoin.AdcState],
                             output: Seq[Attribute]) extends BinaryExecNode {

  // the same distribution pair a shuffled join would demand: both
  // children clustered on their key column — EnsureRequirements
  // inserts co-partitioned exchanges (never a broadcast), AQE
  // coalesces them consistently, and zipPartitions below sees aligned
  // partitions. numPartitions mismatches fail loudly at runtime.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output(1))) ::
      ClusteredDistribution(Seq(right.output(1))) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numPairs" -> SQLMetrics.createMetric(sparkContext, "candidate pairs scored"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): ShardTopKJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val kk = k
    val exSelf = excludeSelf
    val mCos = metric == ShardTopKJoin.Metric.Cosine
    val mDot = metric == ShardTopKJoin.Metric.DotOverNorm
    val mIp = metric == ShardTopKJoin.Metric.Ip
    val mAdc = metric == ShardTopKJoin.Metric.Adc
    val adcState = adc.orNull
    val outRows = longMetric("numOutputRows")
    val pairs = longMetric("numPairs")
    left.execute().zipPartitions(right.execute()) { (cIter, pIter) =>
      // resolve the partition's probes once: key -> replicas. ADC mode
      // does its per-probe setup here — rotation, the M·K lookup
      // table, the residual offset — so the pair loop below pays M
      // lookups per candidate, never a dim-length dot
      val byKey = new java.util.HashMap[Long, java.util.ArrayList[ProbeState]]()
      val all = new java.util.ArrayList[ProbeState]()
      while (pIter.hasNext) {
        val r = pIter.next()
        if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)) {
          val qv = r.getArray(2).toDoubleArray()
          var nb = 0.0
          var i = 0
          while (i < qv.length) { nb += qv(i) * qv(i); i += 1 }
          val key = r.getLong(1)
          val st =
            if (!mAdc)
              new ProbeState(r.getLong(0), qv, math.sqrt(nb), new TopKHeap(kk))
            else {
              // rotate + LUT + residual offset once per replica
              // (shared AdcKernel — one accumulation order everywhere)
              val shard = (if (adcState.packed) key / 65536L else key).toInt
              AdcKernel.probeState(r.getLong(0), qv, math.sqrt(nb), shard,
                adcState, kk)
            }
          var lst = byKey.get(key)
          if (lst == null) { lst = new java.util.ArrayList[ProbeState](4); byKey.put(key, lst) }
          lst.add(st)
          all.add(st)
        }
      }
      if (all.isEmpty) {
        // nothing probes this partition — don't touch the corpus side
        // beyond the iterator contract
        Iterator.empty
      } else {
        // the probe side is partition-RESIDENT (vectors + heaps + any
        // ADC LUTs live for the whole corpus pass). At sane serving
        // shapes that is page-to-sample sized; a corpus-sized query
        // frame at high nprobe×salt on few partitions can grow it to
        // heap-pressure scale — warn loudly with the actionable knobs
        // before an opaque executor OOM does it for us.
        var probeBytes = 0L
        var pi0 = 0
        while (pi0 < all.size) {
          val p = all.get(pi0)
          probeBytes += 8L * p.qv.length + 8L * kk * 2 +
            (if (p.lut != null) 8L * p.lut.length else 0L)
          pi0 += 1
        }
        if (probeBytes > (1L << 28)) {
          ShardTopKJoin.residencyWarnings.incrementAndGet()
          // a task-local slf4j logger: capturing the exec node's own
          // Logging mixin would drag the plan into the closure
          org.slf4j.LoggerFactory.getLogger("graft.plans.ShardTopKJoin")
            .warn(s"partition holds ${all.size} probe replicas " +
              f"(~${probeBytes / 1e9}%.1f GB resident) — raise shuffle " +
              "partitions, lower nprobe/maxRowsPerTask salt, or split " +
              "the query frame to bound per-partition probe state")
        }
        var nPairs = 0L
        while (cIter.hasNext) {
          val r = cIter.next()
          if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) &&
              !((mDot || mAdc) && r.isNullAt(3))) {
            val lst = byKey.get(r.getLong(1))
            if (lst != null && mAdc) {
              // ADC pair loop: M lookups + adds per candidate
              nPairs += AdcKernel.offerAll(lst, r.getLong(0),
                r.getArray(2).toIntArray(), r.getDouble(3), exSelf)
            } else if (lst != null) {
              // exact metrics through the shared kernel (one
              // accumulation order for both fused execs)
              nPairs += ExactKernel.offerAll(lst, r.getLong(0),
                r.getArray(2).toDoubleArray(), mCos, mDot,
                if (mDot) r.getDouble(3) else 0.0, exSelf, mIp)
            }
          }
        }
        pairs += nPairs
        val proj = UnsafeProjection.create(
          Array[org.apache.spark.sql.types.DataType](LongType, LongType, DoubleType))
        val buf = new Array[Any](3)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(buf)
        new Iterator[InternalRow] {
          private var pi = 0
          private var hi = 0
          private var cur: ProbeState = if (all.isEmpty) null else all.get(0)
          private def advance(): Unit = {
            while (cur != null && hi >= cur.heap.size) {
              pi += 1; hi = 0
              cur = if (pi < all.size) all.get(pi) else null
            }
          }
          override def hasNext: Boolean = { advance(); cur != null }
          override def next(): InternalRow = {
            advance()
            val h = cur.heap
            buf(0) = cur.qid
            buf(1) = h.ids(hi)
            buf(2) = h.scores(hi)
            hi += 1
            outRows += 1L
            proj(row)
          }
        }
      }
    }
  }
}
