package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared deterministic MinHash permutation parameters:
  * sig_i(x) = (a_i * x + b_i) mod P over P = 2^31 - 1. Inputs must
  * already be normalized into [0, P).
  */
object MinHashParams {
  val P = 2147483647L // 2^31 - 1
  val NumPerms = 128
  val (a: Array[Long], b: Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val as = Array.fill(NumPerms)(1L + rnd.nextInt((P - 1).toInt).toLong)
    val bs = Array.fill(NumPerms)(rnd.nextInt(P.toInt).toLong)
    (as, bs)
  }
}

/** All 128 minhash signatures in ONE aggregation buffer pass.
  *
  * The naive formulation (128 separate `min(...)` aggregate columns)
  * blows past codegen limits and evaluates 128 expression trees per
  * row; this TypedImperativeAggregate keeps a single long[128] buffer
  * and tight-loops the permutations. Partial aggregation still applies
  * (update on map side, merge after shuffle), so shuffle volume is one
  * row of 128 longs per document.
  */
case class MinHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  import MinHashParams._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(NumPerms)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < NumPerms) {
        val s = (a(i) * h + b(i)) % P
        if (s < buf(i)) buf(i) = s
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumPerms) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(NumPerms * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NumPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAgg = copy(child = cs.head)
}

object MinHashAgg {
  /** Aggregate Column: array<long> of 128 minhash signatures of the
    * (already [0,P)-normalized) hash column.
    */
  def minhashSigs(h: Column): Column =
    ColumnInterop.column(MinHashAgg(ColumnInterop.expression(h)).toAggregateExpression())
}
