package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of array<double> vectors in one buffer pass — the
  * map-reduce half of distributed KMeans (per-cluster mean = vecsum /
  * count) without exploding to (row x dim) and re-assembling. Partial
  * aggregation applies: the shuffle carries one dim-length array per
  * (cluster, map task).
  */
case class VectorSumAgg(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // a ragged row must fail loudly, not silently reset the sum
    if (buf.nonEmpty && buf.length != n)
      throw new IllegalStateException(
        s"VectorSumAgg: vector dimension $n differs from accumulated ${buf.length}")
    val acc = if (buf.length == n) buf else new Array[Double](n)
    var i = 0
    while (i < n) { acc(i) += arr.getDouble(i); i += 1 }
    acc
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    if (buf.length != other.length)
      throw new IllegalStateException(
        s"VectorSumAgg: merging buffers of dimensions ${buf.length} and ${other.length}")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(n: Int): VectorSumAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VectorSumAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): VectorSumAgg = copy(child = cs.head)
}

object VectorSumAgg {
  /** Aggregate Column: element-wise sum of an array<double> column. */
  def vectorSum(v: Column): Column =
    ColumnInterop.column(VectorSumAgg(ColumnInterop.expression(v)).toAggregateExpression())
}
