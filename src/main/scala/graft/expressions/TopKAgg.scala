package graft.expressions

import java.nio.ByteBuffer
import java.util.{PriorityQueue => JPriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types._

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
  * Ordering: score DESC, then id ASC on ties (identical to the window
  * queries' deterministic ordering). eval() returns
  * array<struct<id, score>> best-first.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JPriorityQueue[(Double, Long)]] {
  require(k > 0)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  // heap root = the WORST kept element (lowest score; ties: highest id)
  private def cmp(a: (Double, Long), b: (Double, Long)): Int = {
    val c = java.lang.Double.compare(a._1, b._1)
    if (c != 0) c else java.lang.Long.compare(b._2, a._2)
  }

  override def createAggregationBuffer(): JPriorityQueue[(Double, Long)] =
    new JPriorityQueue[(Double, Long)](k + 1, (a, b) => cmp(a, b))

  private def offer(q: JPriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (q.size < k) q.offer(e)
    else if (cmp(e, q.peek()) > 0) { q.poll(); q.offer(e) }
  }

  override def update(q: JPriorityQueue[(Double, Long)], input: InternalRow): JPriorityQueue[(Double, Long)] = {
    val s = score.eval(input); val i = id.eval(input)
    if (s != null && i != null)
      offer(q, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    q
  }

  override def merge(q: JPriorityQueue[(Double, Long)],
                     o: JPriorityQueue[(Double, Long)]): JPriorityQueue[(Double, Long)] = {
    val it = o.iterator()
    while (it.hasNext) offer(q, it.next())
    q
  }

  // NON-destructive: eval can run more than once on the same buffer
  // (e.g. an accumulating window frame evaluates per row), so read the
  // heap without draining it
  override def eval(q: JPriorityQueue[(Double, Long)]): Any = {
    val arr = q.toArray(new Array[(Double, Long)](q.size))
    val sorted = arr.sortWith((a, b) => cmp(a, b) > 0) // best-first
    new GenericArrayData(sorted.map { case (s, id) => InternalRow(id, s) })
  }

  override def serialize(q: JPriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + q.size * 16)
    bb.putInt(q.size)
    val it = q.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JPriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.offer((bb.getDouble, bb.getLong)))
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
