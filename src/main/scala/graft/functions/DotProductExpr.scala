package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over numeric arrays — the inner loop of every
  * similarity query (cosine scoring evaluates it per candidate pair;
  * q_ann_brute alone runs ~1M pairs × 64 dims at sf0.1).
  *
  * Arithmetic is EXACTLY the declarative form it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x.double * y.double), 0.0, +)`):
  * a sequential ascending-index fold in double precision — so DuckDB's
  * `list_sum(list_transform(...))` oracle mirror is unchanged
  * bit-for-bit. The native form removes the per-element interpreted
  * lambda dispatch and boxing. Null/missing ELEMENTS are not supported
  * (embedding arrays are dense); lengths are folded to the shorter
  * side, matching `zip_with`'s non-null prefix behavior on dense data.
  */
final case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot requires array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotImpl.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotImpl.dot($a, $b, ${elemFloat(left)}, ${elemFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
}

object DotImpl {
  /** Sequential ascending-index double fold (must match the HOF form
    * and the DuckDB mirror exactly — do not reorder or vectorize into
    * a different summation tree). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}
