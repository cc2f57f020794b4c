package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Jaccard similarity over two SORTED-distinct long arrays
  * (hashed shingle sets): one O(n+m) merge pass counting the
  * intersection, versus `array_intersect`'s per-pair hash-set build.
  * The value is identical to
  * `|A∩B| / (|A|+|B|−|A∩B|)` on the same sets, so the DuckDB
  * `list_intersect`-based oracle is unchanged (its count is
  * order-independent). INPUTS MUST BE SORTED ASCENDING AND DISTINCT —
  * the producer stages `array_sort(array_distinct(...))`; unsorted
  * input silently undercounts. */
final case class JaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard requires two array<bigint> args, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaccardImpl.jaccardSorted(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaccardImpl.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardExpr =
    copy(left = newLeft, right = newRight)
}

object JaccardExpr {
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaccardExpr(Bridge.expression(a), Bridge.expression(b)))
}

object JaccardImpl {
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < an && j < bn) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val union = an + bn - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
