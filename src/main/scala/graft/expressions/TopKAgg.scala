package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types._

/** Bounded top-k buffer over two parallel PRIMITIVE arrays — a binary
  * min-heap keyed (score asc, id desc) so the root is always the worst
  * kept element. The aggregate's update path runs once per JOINED row
  * (corpus x probes at serving scale — hundreds of millions of calls
  * per task), so the buffer admits or rejects on primitives alone:
  * no tuple, no boxing, no allocation after construction. The
  * previous JPriorityQueue[(Double, Long)] buffer allocated a Tuple2 +
  * two boxes per offered row; at the 5k x 1M knn JOIN that was ~2B
  * allocations and the difference between 40 s and 14 s measured at
  * round 12 (RangeProfile, 1M vectors, 64 dims).
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // (s1, i1) orders BEFORE (s2, i2) in the heap — i.e. is worse:
  // lower score, ties broken by higher id (final order is score desc,
  // id asc, so the element to evict first is low-score/high-id)
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c < 0 else i1 > i2
  }

  /** Admit (s, id) if the heap has room or it beats the current worst. */
  def offer(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id
      size += 1
      // sift up
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        } else return
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      // replace root, sift down
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(m); ids(i) = ids(m)
          scores(m) = ts; ids(m) = ti
          i = m
        }
      }
    }
  }

  /** (score, id) pairs best-first: score desc, ties id asc. */
  def sortedPairs: Array[(Double, Long)] = {
    val arr = Array.tabulate(size)(i => (scores(i), ids(i)))
    // Total order via Double.compare (matches offer()'s comparator);
    // a raw !=/> double comparison is not total under NaN and can make
    // Timsort throw "Comparison method violates its general contract".
    java.util.Arrays.sort(arr, new java.util.Comparator[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    arr
  }
}

/** Per-group top-k as a bounded-heap aggregate.
  *
  * The window formulation (`row_number() over (partition by g order by
  * s) <= k`) shuffles EVERY scored row to the window partitions and
  * sorts them. This aggregate keeps a k-element heap per group, so
  * partial aggregation sends at most k rows per (group, map-partition)
  * across the shuffle and nothing is ever fully sorted — the
  * difference between shuffling the corpus and shuffling k rows per
  * query at 100 TB.
  *
  * Runs in ObjectHashAggregateExec (TypedImperativeAggregate): note
  * that exec falls back to SORT-BASED aggregation after
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * DISTINCT KEYS per task (Spark default 128) — at join-serving scale
  * (thousands of query_ids per task) the fallback sorts the entire
  * joined stream and costs ~4x the aggregation itself.
  * [[graft.GraftSession]] raises the default; see the comment there.
  *
  * Ordering: score DESC, then id ASC on ties (identical to the window
  * queries' deterministic ordering). eval() returns
  * array<struct<id, score>> best-first.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  // update runs once per joined row; when the children are plain bound
  // column reads (the overwhelmingly common shape — the score is a
  // projected column under the agg), read primitives straight off the
  // row instead of Expression.eval's boxed Any round-trip (two boxes
  // per row x hundreds of millions of rows on a serving join)
  @transient private lazy val scoreOrd: Int = score match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
      if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }
  @transient private lazy val idOrd: Int = id match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
      if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  override def update(q: TopKHeap, input: InternalRow): TopKHeap = {
    if (scoreOrd >= 0 && idOrd >= 0) {
      if (!input.isNullAt(scoreOrd) && !input.isNullAt(idOrd))
        q.offer(input.getDouble(scoreOrd), input.getLong(idOrd))
    } else {
      val s = score.eval(input); val i = id.eval(input)
      if (s != null && i != null)
        q.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    q
  }

  override def merge(q: TopKHeap, o: TopKHeap): TopKHeap = {
    var i = 0
    while (i < o.size) { q.offer(o.scores(i), o.ids(i)); i += 1 }
    q
  }

  // NON-destructive: eval can run more than once on the same buffer
  // (e.g. an accumulating window frame evaluates per row), so read the
  // heap without draining it
  override def eval(q: TopKHeap): Any =
    new GenericArrayData(q.sortedPairs.map { case (s, id) => InternalRow(id, s) })

  override def serialize(q: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + q.size * 16)
    bb.putInt(q.size)
    var i = 0
    while (i < q.size) { bb.putDouble(q.scores(i)); bb.putLong(q.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.offer(bb.getDouble, bb.getLong))
    q
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKAgg =
    copy(score = cs(0), id = cs(1))
}

object TopKAgg {
  /** Aggregate Column: best-first array<struct<id,score>> of the top-k
    * (score desc, id asc) rows per group.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnInterop.column(
      TopKAgg(ColumnInterop.expression(score), ColumnInterop.expression(id), k)
        .toAggregateExpression())
}
