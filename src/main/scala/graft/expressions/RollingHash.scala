package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Polynomial rolling hash of a string's UTF-8 bytes:
  * h = sum(b_i * B^(n-1-i)) mod 2^61-1, base B=257 — the
  * content-defined-chunking / Rabin-style fingerprint primitive for
  * the multimodal scale path (shift-resistant windows over byte
  * streams), as a codegen'd expression rather than a UDF.
  */
object RollingHashKernel {
  val P = 2305843009213693951L // 2^61 - 1 (Mersenne)
  val B = 257L

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      // (h * B + b) mod P without overflow: h < 2^61, B = 2^8+1 ->
      // h*B < 2^70 — split the multiply via Math.multiplyHigh-free
      // route: h*257 = (h << 8) + h, each term reduced mod P
      val shifted = mulMod(h, B)
      h = (shifted + (bytes(i) & 0xFF)) % P
      i += 1
    }
    h
  }

  /** (a * b) mod P for 0 <= a < P, small b (fits the 128-bit product
    * in two 64-bit halves via Math.multiplyHigh).
    */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold the 128-bit value mod 2^61-1: (hi*2^64 + lo) mod P where
    // 2^64 mod P = 8  ->  hi*8 + lo, then reduce lo's top bits
    val folded = ((hi << 3) | (lo >>> 61)) + (lo & P)
    val r = (folded & P) + (folded >>> 61)
    if (r >= P) r - P else r
  }
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"rolling_hash expects STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    RollingHashKernel.hash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.RollingHashKernel.hash($c.getBytes())")

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

object RollingHash {
  def rollingHash(c: Column): Column = ColumnInterop.column(RollingHash(ColumnInterop.expression(c)))
}
