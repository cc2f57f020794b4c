package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 32-bit SimHash over a token-hash array: one pass accumulating
  * all 32 bit votes, replacing the declarative form's 32 interpreted
  * `aggregate` folds (one per bit) over the same array. Semantics are
  * identical to [[TextFunctions.simhashOnHashes]] with bits = 32 —
  * bit b of the result is set iff the ±1 votes of the inputs' b-th
  * hash bits sum positive — so the DuckDB per-bit mirror is unchanged.
  * (Equivalence holds for NON-NEGATIVE inputs — hash60's domain; the
  * declarative form's `% 2` test differs from `& 1` on negatives.)
  * Null elements are not supported (token-hash arrays are dense). */
final case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def apply(c: Column): Column = Bridge.column(SimHashExpr(Bridge.expression(c)))
}

object SimHashImpl {
  def simhash32(hashes: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 32) {
        // Same vote as the declarative form: +1 if bit b of h is set.
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
