package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-component MinHash signature over a shingle-hash array: ONE
  * pass over the array updating all k minima, replacing k interpreted
  * `aggregate`-fold columns (one `array_min(transform(...))` per
  * component) over the same input. Component i is exactly
  * [[TextFunctions.minhashMixed]]'s value — `min over h of
  * ((h mod p)·aᵢ + bᵢ) mod p` with the same md5-derived universal-hash
  * constants — so the DuckDB oracle mirror is unchanged (equivalence
  * asserted component-wise in FunctionsSpec). Inputs must be
  * non-negative (hash60's domain, as with [[SimHashExpr]]); an empty
  * array yields null, matching `array_min` over an empty transform. */
final case class MinHashExpr(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty, "need one (a,b) pair per component")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashImpl.signature($c, $aRef, $bRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  // Array params compare by reference under the synthesized case-class
  // equals, so two structurally identical expressions built from
  // separate Column calls would never canonicalize equal — defeating
  // Catalyst CSE and exchange reuse. Compare the constant tables by
  // value instead (asserted in FunctionsSpec).
  override def equals(other: Any): Boolean = other match {
    case that: MinHashExpr =>
      child == that.child &&
        java.util.Arrays.equals(a, that.a) && java.util.Arrays.equals(b, that.b)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(a)) +
      java.util.Arrays.hashCode(b)

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}

object MinHashExpr {
  /** Signature column with components 0 until k of the shared
    * [[TextFunctions.mixConsts]] hash family. */
  def apply(c: Column, k: Int): Column = {
    val consts = (0 until k).map(TextFunctions.mixConsts)
    Bridge.column(MinHashExpr(Bridge.expression(c),
      consts.map(_._1).toArray, consts.map(_._2).toArray))
  }
}

object MinHashImpl {
  private val P = TextFunctions.MixP

  /** All k minima in one pass; null for an empty input (the declarative
    * per-component `array_min` of an empty array is null). */
  def signature(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hashes.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (hm * a(j) + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
