package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native sign-signature LSH bucket id: all `nPlanes` projections of a
  * vector against the materialized hyperplane matrix in one pass,
  * replacing nPlanes interpreted `aggregate(zip_with(...))` folds per
  * row (the hot scan stage of every LSH query — at 100 TB the bucket
  * id is computed once per corpus row).
  *
  * Bit-exact with the declarative [[VectorFunctions.lshBucketHof]]:
  * same sequential ascending-index double fold per plane, and the SAME
  * 6-dp HALF_UP rounding before the sign test (`scala.math.BigDecimal`
  * — the identical call Spark's `Round` evaluates — so the oracle's
  * `round(list_sum(...), 6) > 0` cut is unchanged). Equivalence over
  * the real embeddings table is asserted in FunctionsSpec. */
final case class PlaneBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty, "need at least one plane")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires array<float>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    PlaneBucketImpl.bucket(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PlaneBucketImpl.bucket($c, $pRef)")
  }

  // Value-semantics equality for the plane matrix (the synthesized
  // case-class equals compares Array by reference), so structurally
  // identical bucket expressions canonicalize equal and Catalyst can
  // CSE / reuse exchanges across separately-built columns.
  override def equals(other: Any): Boolean = other match {
    case that: PlaneBucketExpr =>
      child == that.child &&
        java.util.Arrays.deepEquals(
          planes.asInstanceOf[Array[AnyRef]], that.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PlaneBucketExpr =
    copy(child = newChild)
}

object PlaneBucketExpr {
  def apply(c: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(PlaneBucketExpr(Bridge.expression(c), planes))
}

object PlaneBucketImpl {
  def bucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val n = v.numElements()
    // A vector whose length differs from the plane dimension buckets
    // to 0, exactly like the HOF form: zip_with pads the shorter side
    // with nulls, the fold goes null, and when(null > 0) contributes
    // no bit for ANY plane. A silent prefix-dot here would send the
    // row to an arbitrary bucket the oracle disagrees with.
    if (planes.length == 0 || n != planes(0).length) return 0L
    var out = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val m = p.length
      var s = 0.0
      var i = 0
      while (i < m) {
        // Same fold as zip_with + aggregate: ascending index, double.
        s += v.getFloat(i).toDouble * p(i)
        i += 1
      }
      // Spark's Round(col, 6) evaluation for DoubleType, verbatim:
      // scala BigDecimal from the double, HALF_UP at scale 6.
      val rounded = scala.math.BigDecimal(s)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      if (rounded > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
