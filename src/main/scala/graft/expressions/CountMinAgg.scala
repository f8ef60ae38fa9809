package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types._

/** Count-Min sketch as a single-buffer aggregate — approximate counts
  * for heavy-hitter queries in ONE pass with FIXED memory (Cormode &
  * Muthukrishnan 2005). An exact word count shuffles every token to
  * its group; the sketch is a depth×width long matrix that partial
  * aggregation merges by elementwise addition, so the shuffle carries
  * one fixed-size buffer per map partition regardless of corpus size —
  * the same contract as [[MinHashAgg]]/[[TopKAgg]]. Guarantees: point
  * estimates never undercount, and overcount ≤ e·N/width with
  * probability 1−(1/e)^depth (N = total updates).
  *
  * Hashing: row r uses XxHash64 with seed `seedBase + r` via Spark's
  * own [[XxHash64Function]], so [[CountMinAgg.estimate]] can rebuild
  * the identical index as a NATIVE codegen'd expression over the
  * sketch literal — estimation stays in the plan, no UDF.
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var r = 0
      while (r < depth) {
        val h = XxHash64Function.hash(v, child.dataType, CountMinAgg.SeedBase + r)
        buf(r * width + (((h % width) + width) % width).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinAgg =
    copy(child = cs(0))
}

object CountMinAgg {
  /** Seeds are `SeedBase + row`; [[estimate]] must stay in lockstep. */
  val SeedBase: Long = 0x6772616674L // "graft"

  /** Aggregate Column: the depth×width sketch as one flat
    * array<long>, row-major.
    */
  def sketch(item: Column, depth: Int = 4, width: Int = 2048): Column =
    ColumnInterop.column(
      CountMinAgg(ColumnInterop.expression(item), depth, width).toAggregateExpression())

  /** Point estimate for `item` against a sketch-valued Column
    * (typically a collected sketch re-entering the plan as a literal —
    * depth×width longs, kilobytes, the codebook pattern): min over
    * rows of the row's bucket. Pure codegen'd expressions.
    */
  def estimate(sketch: Column, item: Column, depth: Int = 4, width: Int = 2048): Column = {
    val perRow = (0 until depth).map { r =>
      val h = ColumnInterop.column(
        XxHash64(Seq(ColumnInterop.expression(item)), SeedBase + r))
      element_at(sketch, (lit(r * width) + pmod(h, lit(width.toLong)) + 1).cast("int"))
    }
    least(perRow: _*)
  }
}
