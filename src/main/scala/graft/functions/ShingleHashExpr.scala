package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native sorted-distinct hashed-shingle set: the whole
  * tokens → n-gram shingles → hash60 → distinct → sort pipeline in ONE
  * pass per row, replacing the interpreted higher-order chain
  * `array_sort(array_distinct(transform(shingles(toks, n), hash60)))`
  * — the hot scan stage of every shingle-based dedup query (minhash,
  * n-gram Jaccard, decontamination). HOFs like `transform` are
  * CodegenFallback in Spark, so the declarative chain allocates one
  * UTF8String per shingle plus three intermediate arrays per row; this
  * expression streams each window's token bytes straight into a
  * thread-local md5 (the shingle string is never materialized — md5 of
  * the bytes of `tok₀ + ' ' + … + tokₙ₋₁` is byte-identical to md5 of
  * the joined string) and sorts/dedups one primitive long array.
  *
  * Bit-exact with the declarative form: [[Hash60Impl.hash60]]'s 60-bit
  * truncation over the same space-joined shingle text, ascending sort,
  * first-occurrence dedup (order-irrelevant after sorting). Fewer than
  * `n` tokens yields an EMPTY array — `shingles`' `otherwise(array())`
  * branch — so callers need no size pre-filter for correctness. Null
  * token elements are SKIPPED within their window exactly as the
  * chain's `concat_ws` skips them (a window of [a, null, b] hashes
  * "a b"). The DuckDB oracle mirror (`OracleSql.hashedShingles`) is
  * unchanged. */
final case class ShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashImpl.hashedSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashImpl.hashedSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

object ShingleHashExpr {
  def apply(toks: Column, n: Int): Column =
    Bridge.column(ShingleHashExpr(Bridge.expression(toks), n))
}

object ShingleHashImpl {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val EmptyLongs = new GenericArrayData(Array.emptyLongArray)

  /** Sorted distinct hash60 values of the `n`-token shingles of `toks`;
    * empty for fewer than `n` tokens. */
  def hashedSet(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return EmptyLongs
    // Token bytes once per token (each participates in up to n
    // windows); null elements stay null and are skipped per window
    // below, matching concat_ws.
    val bytes = new Array[Array[Byte]](cnt)
    var i = 0
    while (i < cnt) {
      // isNullAt first: unsafe-backed arrays return garbage, not null,
      // from a typed getter on a null slot.
      bytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val out = new Array[Long](cnt - n + 1)
    var w = 0
    while (w < out.length) {
      md.reset()
      var j = 0
      var emitted = 0
      while (j < n) {
        val b = bytes(w + j)
        if (b != null) {
          if (emitted > 0) md.update(' '.toByte)
          md.update(b)
          emitted += 1
        }
        j += 1
      }
      out(w) = Hash60Impl.longFromDigest(md.digest())
      w += 1
    }
    java.util.Arrays.sort(out)
    // In-place dedup of the sorted array.
    var uniq = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(uniq - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    if (uniq == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }
}
