package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnInterop
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Tight loops over vector columns, shared by interpreted eval and
  * generated code. Accumulation is sequential double-precision over
  * element index — deliberately the same order as DuckDB's
  * list_cosine_similarity / list_distance / list_inner_product so the
  * oracle compare is stable after round(,4).
  *
  * Zero-norm guard in [[cosine]] mirrors the reference
  * (compute_server.py:32-37: cosine of a zero vector is 0.0).
  */
object VectorKernels {
  /** Mismatched dimensions fail LOUDLY: the loops index both arrays by
    * the shared length, and without this check a shorter right side
    * reads past its element region (unsafe memory — garbage values),
    * while a shorter left side silently truncates the comparison. The
    * DuckDB oracle's list functions reject ragged pairs too, so a
    * silent answer here could never match it. One branch per ROW —
    * noise next to the O(dim) loop.
    */
  private def checkDims(na: Int, nb: Int): Unit =
    if (na != nb) throw new IllegalArgumentException(
      s"vector kernel on mismatched dimensions: $na vs $nb (ragged embedding row?)")

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkDims(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkDims(n, b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    checkDims(n, b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

}

/** Base for the binary vector kernels: requires two ARRAY<DOUBLE>
  * inputs (the Column wrappers below cast float arrays — exact
  * widening), and stays inside whole-stage codegen via a static kernel
  * call instead of a per-row virtual eval.
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  protected def kernelName: String

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorKernels.$kernelName($a, $b);")
}

/** Cosine similarity — the reference's search metric (compute_server.py:106-138). */
case class CosineSim(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernelName: String = "cosine"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.cosine(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim = copy(l, r)
}

/** Euclidean distance — the reference's shard-routing metric (compute_server.py:40-48). */
case class L2Dist(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernelName: String = "l2"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.l2(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Dist = copy(l, r)
}

case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def kernelName: String = "dot"
  override protected def evalKernel(a: ArrayData, b: ArrayData): Double = VectorKernels.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct = copy(l, r)
}

object VectorExpressions {
  private def asDouble(c: Column): Expression =
    ColumnInterop.expression(c.cast("array<double>"))
  private def bin(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnInterop.column(f(asDouble(a), asDouble(b)))

  /** Cosine similarity between two vector columns (float or double arrays). */
  val cosineSim: (Column, Column) => Column = bin(CosineSim.apply)
  /** Euclidean distance between two vector columns. */
  val l2Dist: (Column, Column) => Column = bin(L2Dist.apply)
  /** Dot product between two vector columns. */
  val dotProduct: (Column, Column) => Column = bin(DotProduct.apply)
  /** L2 norm of a vector column. */
  def vecNorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dotProduct(a, a))
  }
}
