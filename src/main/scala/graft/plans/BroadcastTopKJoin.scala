package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PlanInterop
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.expressions.TopKHeap

/** Fused BROADCAST scoring + per-query bounded top-k — the
  * query-count-bounded sibling of [[ShardTopKJoin]] for exact
  * all-shards scoring (recall ground truth, brute-force knn over a
  * small query batch).
  *
  * The declarative exact arm — `corpus JOIN broadcast(queries) ON
  * true`, score projection, `groupBy(query_id).agg(topK)` — keeps the
  * corpus scan map-only (the right 100 TB shape when the query side is
  * tiny: no corpus shuffle, partial heaps merge per partition), but
  * walks every (corpus row, query) pair through ObjectHashAggregate:
  * an UnsafeRow write, a group-key projection, and a hash probe per
  * pair — at 1M rows x 48 queries the walk costs as much as the
  * scoring. This exec keeps the exact same distribution demands
  * (corpus unspecified — NO exchange; probes via a real
  * `BroadcastDistribution(IdentityBroadcastMode)`, so
  * EnsureRequirements plans the one tiny broadcast) and fuses scoring
  * + heaps into the partition loop: every probe scores every corpus
  * row, partials are ≤ k rows per (probe, partition), and the final
  * [[graft.expressions.TopKAgg]] merge aggregates thousands of rows.
  *
  * Metrics mirror [[ShardTopKJoin]]'s exact arms term-for-term
  * (cosine: identical accumulation to
  * [[graft.expressions.VectorKernels.cosine]]; L2: heap on the negated
  * distance, [[ranked]] re-negates) — so results are BIT-IDENTICAL to
  * the declarative plan, spec-pinned. Metric support (the require()
  * guards below are the source of truth): cosine and l2 in both keyed
  * and unkeyed modes; adc in KEYED mode only (the replica's key is the
  * shard its lookup table and residual offset resolve from — the
  * one-pass compressed fusion recall rides it); dot_norm is a
  * shard-join shape and is refused here; salt-packing never applies
  * (broadcast probes replicate, they don't shuffle).
  *
  * Reference anchor: compute_server.py:106-138's exact scan is the
  * per-query form; this is the batched ground-truth pass
  * `VectorStore.evalRecall` measures curves with.
  */
object BroadcastTopKJoin {

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match { case ArrayType(DoubleType, _) => true; case _ => false }

  /** Per-partition partial top-k for `probes` (query_id: LONG, qv:
    * ARRAY<DOUBLE> — positional) against `corpus` (id: LONG, vec:
    * ARRAY<DOUBLE> — positional): every probe scores every corpus row.
    * Output (query_id, id, score), ≤ k rows per (probe, partition);
    * merge with [[ranked]]'s TopKAgg. Null ids/vectors skip; L2 scores
    * emit NEGATED (heap order).
    *
    * `keyed = true` is the IVF-ROUTED form: corpus = (id, key, vec)
    * and probes = (query_id, key, qv) — a corpus row scores only the
    * probe replicas that share its key (the broadcast twin of
    * [[ShardTopKJoin]]'s equi-join, for query batches small enough to
    * broadcast: the batch-knn and hybrid page-arm shape, where the
    * corpus staying put beats a shard shuffle).
    */
  private def isIntArray(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) => true
      case _ => false
    }

  def partials(corpus: DataFrame, probes: DataFrame, k: Int,
               excludeSelf: Boolean,
               metric: String = ShardTopKJoin.Metric.Cosine,
               keyed: Boolean = false,
               adc: Option[ShardTopKJoin.AdcState] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(metric == ShardTopKJoin.Metric.Cosine ||
        metric == ShardTopKJoin.Metric.L2 ||
        metric == ShardTopKJoin.Metric.Ip ||
        metric == ShardTopKJoin.Metric.Adc,
      s"broadcast top-k metric must be cosine, l2, ip, or adc, got '$metric'")
    val wantAdc = metric == ShardTopKJoin.Metric.Adc
    require(wantAdc == adc.isDefined,
      "Metric.Adc requires an AdcState (and only Metric.Adc takes one)")
    require(!wantAdc || keyed,
      "broadcast Metric.Adc is keyed-only: the replica's key IS the shard " +
        "its lookup table and residual offset resolve from")
    require(adc.forall(!_.packed),
      "broadcast top-k never salt-packs keys; AdcState.packed must be false")
    val ct = corpus.schema.fields.map(_.dataType)
    val pt = probes.schema.fields.map(_.dataType)
    if (wantAdc) {
      require(ct.length == 4 && ct(0) == LongType && ct(1) == LongType &&
        isIntArray(ct(2)) && ct(3) == DoubleType,
        s"ADC corpus must be (LONG, LONG, ARRAY<INT>, DOUBLE) positionally, got " +
          corpus.schema.simpleString)
      require(pt.length == 3 && pt(0) == LongType && pt(1) == LongType &&
        isDoubleArray(pt(2)),
        s"keyed probes must be (LONG, LONG, ARRAY<DOUBLE>) positionally, got " +
          probes.schema.simpleString)
    } else if (keyed) {
      require(ct.length == 3 && ct(0) == LongType && ct(1) == LongType &&
        isDoubleArray(ct(2)),
        s"keyed corpus must be (LONG, LONG, ARRAY<DOUBLE>) positionally, got " +
          corpus.schema.simpleString)
      require(pt.length == 3 && pt(0) == LongType && pt(1) == LongType &&
        isDoubleArray(pt(2)),
        s"keyed probes must be (LONG, LONG, ARRAY<DOUBLE>) positionally, got " +
          probes.schema.simpleString)
    } else {
      require(ct.length == 2 && ct(0) == LongType && isDoubleArray(ct(1)),
        s"corpus must be (LONG, ARRAY<DOUBLE>) positionally, got ${corpus.schema.simpleString}")
      require(pt.length == 2 && pt(0) == LongType && isDoubleArray(pt(1)),
        s"probes must be (LONG, ARRAY<DOUBLE>) positionally, got ${probes.schema.simpleString}")
    }
    val out = Seq(
      AttributeReference("query_id", LongType, nullable = false)(),
      AttributeReference("id", LongType, nullable = false)(),
      AttributeReference("score", DoubleType, nullable = false)())
    PlanInterop.ofRows(corpus.sparkSession,
      BroadcastTopKJoinNode(corpus.queryExecution.analyzed,
        probes.queryExecution.analyzed, k, excludeSelf, metric, keyed, adc, out))
  }

  /** Full result: fused partials + TopKAgg merge → (query_id, rank,
    * `idName`, score), rank 1-based on (score desc, id asc); for L2
    * score is the DISTANCE and rank ascends it.
    */
  def ranked(corpus: DataFrame, probes: DataFrame, k: Int,
             excludeSelf: Boolean, idName: String = "id",
             metric: String = ShardTopKJoin.Metric.Cosine,
             keyed: Boolean = false,
             adc: Option[ShardTopKJoin.AdcState] = None): DataFrame =
    ShardTopKJoin.rankedFrom(
      partials(corpus, probes, k, excludeSelf, metric, keyed, adc),
      k, metric, idName)
}

/** Logical node — opaque to the optimizer, children POSITIONAL:
  * left = (id[, key], vec), right = (query_id[, key], qv).
  */
case class BroadcastTopKJoinNode(left: LogicalPlan, right: LogicalPlan,
                                 k: Int, excludeSelf: Boolean, metric: String,
                                 keyed: Boolean,
                                 adc: Option[ShardTopKJoin.AdcState],
                                 output: Seq[Attribute]) extends BinaryNode {
  override def producedAttributes: AttributeSet = outputSet
  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastTopKJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule — injected by [[graft.GraftExtensions]]. */
object BroadcastTopKJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: BroadcastTopKJoinNode =>
      BroadcastTopKJoinExec(planLater(n.left), planLater(n.right),
        n.k, n.excludeSelf, n.metric, n.keyed, n.adc, n.output) :: Nil
    case _ => Nil
  }
}

case class BroadcastTopKJoinExec(left: SparkPlan, right: SparkPlan,
                                 k: Int, excludeSelf: Boolean, metric: String,
                                 keyed: Boolean,
                                 adc: Option[ShardTopKJoin.AdcState],
                                 output: Seq[Attribute]) extends BinaryExecNode {

  // corpus: wherever it already lives — NO exchange (the scan stays
  // map-only at any corpus size). probes: a genuine broadcast, so
  // EnsureRequirements plans one BroadcastExchange of the tiny side
  // and every partition sees the full probe set.
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numPairs" -> SQLMetrics.createMetric(sparkContext, "candidate pairs scored"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastTopKJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val kk = k
    val exSelf = excludeSelf
    val isKeyed = keyed
    val vecOrd = if (isKeyed) 2 else 1
    val mCos = metric == ShardTopKJoin.Metric.Cosine
    val mIp = metric == ShardTopKJoin.Metric.Ip
    val mAdc = metric == ShardTopKJoin.Metric.Adc
    val adcState = adc.orNull
    val outRows = longMetric("numOutputRows")
    val pairs = longMetric("numPairs")
    val bcProbes = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { cIter =>
      // fresh heaps per partition (the broadcast rows are shared and
      // immutable; probe state is partition-local). Keyed mode also
      // resolves the key -> replicas map here, once per partition;
      // ADC mode builds each replica's LUT here too (the key IS the
      // shard — no salt packing on the broadcast path).
      val rows = bcProbes.value
      val all = new java.util.ArrayList[ProbeState](rows.length)
      val byKey =
        if (isKeyed) new java.util.HashMap[Long, java.util.ArrayList[ProbeState]]()
        else null
      var ri = 0
      while (ri < rows.length) {
        val r = rows(ri)
        if (!r.isNullAt(0) && !r.isNullAt(vecOrd) &&
            !(isKeyed && r.isNullAt(1))) {
          val qv = r.getArray(vecOrd).toDoubleArray()
          var nb = 0.0
          var i = 0
          while (i < qv.length) { nb += qv(i) * qv(i); i += 1 }
          val st =
            if (mAdc)
              AdcKernel.probeState(r.getLong(0), qv, math.sqrt(nb),
                r.getLong(1).toInt, adcState, kk)
            else
              new ProbeState(r.getLong(0), qv, math.sqrt(nb), new TopKHeap(kk))
          if (isKeyed) {
            val key = r.getLong(1)
            var lst = byKey.get(key)
            if (lst == null) {
              lst = new java.util.ArrayList[ProbeState](4); byKey.put(key, lst)
            }
            lst.add(st)
          }
          all.add(st)
        }
        ri += 1
      }
      if (all.isEmpty) Iterator.empty
      else {
        var nPairs = 0L
        while (cIter.hasNext) {
          val r = cIter.next()
          if (!r.isNullAt(0) && !r.isNullAt(vecOrd) &&
              !(isKeyed && r.isNullAt(1)) && !(mAdc && r.isNullAt(3))) {
            val id = r.getLong(0)
            val cand =
              if (isKeyed) byKey.get(r.getLong(1)) else all
            if (cand != null) {
              // shared kernels: one accumulation order across both
              // fused execs (ExactKernel / AdcKernel)
              if (mAdc)
                nPairs += AdcKernel.offerAll(cand, id,
                  r.getArray(2).toIntArray(), r.getDouble(3), exSelf)
              else
                nPairs += ExactKernel.offerAll(cand, id,
                  r.getArray(vecOrd).toDoubleArray(), mCos,
                  mDot = false, dotNorm = 0.0, exSelf, mIp)
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
