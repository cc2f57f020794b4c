package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's 60-bit content hash —
  * the inner loop of every dedup/fingerprint pipeline.
  *
  * Semantics are EXACTLY the legacy composite
  * `conv(substring(md5(c), 1, 15), 16, 10)` (the first 15 hex digits of
  * the md5 as a long), so DuckDB's
  * `('0x' || substr(md5(e),1,15))::BIGINT` mirror is unchanged. The
  * native form removes the interpreted chain's hex-string
  * materialization and BigInteger radix conversion: one thread-local
  * digest, 60 bits taken straight off the digest bytes, and
  * whole-stage-codegen emits a static call instead of three boxed
  * expression evals. This is preference tier (b) from the build brief:
  * a custom `Expression` with `doGenCode`, reached only because the
  * built-in composition was measurably the hot path. */
final case class Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60Impl.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60Impl.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60Expr =
    copy(child = newChild)
}

object Hash60Expr {
  def apply(c: Column): Column = Bridge.column(Hash60Expr(Bridge.expression(c)))
}

object Hash60Impl {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** THE md5→60-bit fold (first 15 hex digits as a long = the
    * big-endian first 8 digest bytes shifted right 4): the single
    * definition of the engine's hash family, shared by the native
    * expressions, the shingle hasher, and every driver-side constant
    * — a change here is a change to every oracle mirror at once. */
  def longFromDigest(d: Array[Byte]): Long =
    (((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
     ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
     ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
     ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)) >>> 4

  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    longFromDigest(md.digest(s.getBytes))
  }

  /** Driver-side String form (same family, fresh digest per call —
    * these run once per constant, not per row). */
  def hash60String(s: String): Long =
    longFromDigest(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))
}
