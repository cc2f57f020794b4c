package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, LongType}

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
  * (embedding arrays are dense); MISMATCHED lengths return NULL,
  * exactly like the HOF form (`zip_with` pads the shorter side with
  * nulls, poisoning the fold) — a truncated embedding must surface as
  * missing, never as a silently-partial prefix score.
  *
  * Element types: float, double, and byte — the byte case is the int8
  * quantized-code path (q_ann_quantized), where each product is an
  * integer ≤ 127²·dim and therefore exactly representable, so the
  * double fold stays deterministic.
  */
final case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Element accessor kind: 0 = double, 1 = float, 2 = byte. */
  private def elemKind(e: Expression): Int = e.dataType match {
    case ArrayType(FloatType, _) => 1
    case ArrayType(ByteType, _)  => 2
    case _                       => 0
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _                                               => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot requires array<float|double|tinyint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // NULL on length mismatch (see scaladoc), so nullable regardless of
  // the children's nullability.
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) null
    else DotImpl.dotKind(a, b, elemKind(left), elemKind(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotImpl.dotKind($a, $b,
          ${elemKind(left)}, ${elemKind(right)});
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
}

/** Native INTEGER dot product over `array<bigint>` — the µ-unit inner
  * loop of the Lloyd/k-means chain (distances carried as exact µ²
  * longs so argmin, tie-break, and inertia never pass through a
  * rounded double; the r7–r9 q_kmeans hash-red was a representable
  * half at the 6th decimal rounding differently across engines).
  * Mirrors DuckDB's `list_sum(list_transform(...))::BIGINT` over
  * BIGINT[] operands. Overflow headroom: µ-unit components ≤ ~6e5,
  * so each product ≤ ~4e11 and a 64-dim sum ≤ ~3e13 — five decades
  * under Long.MaxValue. NULL on length mismatch, like
  * [[DotProductExpr]].
  */
final case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long requires array<bigint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() != b.numElements()) null
    else DotImpl.dotLong(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotImpl.dotLong($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
}

object DotLongExpr {
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotLongExpr(Bridge.expression(a), Bridge.expression(b)))
}

object DotImpl {
  /** Sequential ascending-index double fold (must match the HOF form
    * and the DuckDB mirror exactly — do not reorder or vectorize into
    * a different summation tree). Kinds: 0 = double, 1 = float,
    * 2 = byte. */
  def dotKind(a: ArrayData, b: ArrayData, aKind: Int, bKind: Int): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = aKind match {
        case 1 => a.getFloat(i).toDouble
        case 2 => a.getByte(i).toDouble
        case _ => a.getDouble(i)
      }
      val y = bKind match {
        case 1 => b.getFloat(i).toDouble
        case 2 => b.getByte(i).toDouble
        case _ => b.getDouble(i)
      }
      s += x * y
      i += 1
    }
    s
  }

  /** Exact long fold for [[DotLongExpr]] (sequential, but integer
    * addition is associative-exact so order is immaterial here). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Back-compat boolean form (float-or-double only). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double =
    dotKind(a, b, if (aFloat) 1 else 0, if (bFloat) 1 else 0)
}
