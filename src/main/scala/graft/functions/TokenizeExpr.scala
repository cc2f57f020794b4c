package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native normalizing tokenizer: the engine's
  * `split(trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]",
  * " "), " +", " ")), " ")` chain in ONE character pass. The chain is
  * the scan-stage prefix of every text query (lang-id, quality, token
  * counts, fingerprints, the whole dedup family), and the two regex
  * passes each materialize a full intermediate string per row.
  *
  * Semantic equivalence is by case analysis on what the chain does per
  * input code point (pinned on the real corpus and on adversarial edge
  * cases in FunctionsSpec):
  *  - `A`–`Z` lowercase into `a`–`z`: emitted;
  *  - `a`–`z`, `0`–`9`: emitted; anything else ASCII is replaced by a
  *    space by the first regex: boundary;
  *  - U+212A (Kelvin sign) is the only non-ASCII code point whose
  *    lowercase is a single ASCII letter (`k`): emitted;
  *  - U+0130 (`İ`) lowercases to `i` + U+0307 (the one unconditional
  *    one-to-many lowercase mapping): the `i` is emitted and the
  *    combining dot becomes a boundary;
  *  - every other code point lowercases to a non-[a-z0-9] code point
  *    (surrogate halves included) and becomes a boundary. Consecutive
  *    boundaries collapse exactly like the `" +"` regex; leading and
  *    trailing boundaries vanish exactly like `trim`.
  * The one surviving artifact of the chain — `split("", " ")` yields a
  * single empty token for text that normalizes to nothing — is
  * reproduced so the two forms are indistinguishable downstream.
  * (Like the chain itself, which lowercases via the JVM's default
  * locale for non-ASCII input, this assumes a root-like default locale
  * — under a Turkish default locale the chain would already behave
  * differently.) */
final case class TokenizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override protected def nullSafeEval(input: Any): Any =
    TokenizeImpl.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeImpl.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
}

object TokenizeExpr {
  /** The cast keeps the Column surface as permissive as the legacy
    * chain's `lower()` (which implicitly cast atomic inputs);
    * string→string is a no-op the optimizer removes. */
  def apply(c: Column): Column =
    Bridge.column(TokenizeExpr(Bridge.expression(c.cast("string"))))
}

object TokenizeImpl {

  /** Dispatch: an ASCII-only input (the overwhelmingly common case in
    * the target corpora) is tokenized directly over the UTF8String's
    * bytes \u2014 no java.lang.String, no StringBuilder, no per-char
    * decoding \u2014 and only inputs containing a non-ASCII byte take the
    * String path (whose case analysis needs code points: U+212A /
    * U+0130 handling). For ASCII the two paths are byte-identical:
    * every ASCII byte is one code point, lowercase is `+32`, and both
    * collapse boundary runs and trim ends the same way. */
  def tokenize(s: UTF8String): ArrayData = {
    val nb = s.numBytes
    var i = 0
    while (i < nb) {
      if ((s.getByte(i) & 0x80) != 0) return tokenizeGeneric(s.toString)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var buf = new Array[Byte](16)
    var len = 0
    i = 0
    while (i < nb) {
      val b = s.getByte(i)
      val emit: Int =
        if (b >= 'A' && b <= 'Z') b + 32
        else if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) b
        else -1
      if (emit >= 0) {
        if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
        buf(len) = emit.toByte
        len += 1
      } else if (len > 0) {
        out += UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
        len = 0
      }
      i += 1
    }
    if (len > 0) out += UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
    if (out.isEmpty) out += UTF8String.EMPTY_UTF8
    new GenericArrayData(out.toArray)
  }

  private def tokenizeGeneric(str: String): ArrayData = {
    val n = str.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    val sb = new java.lang.StringBuilder(16)
    def flush(): Unit =
      if (sb.length > 0) { out += UTF8String.fromString(sb.toString); sb.setLength(0) }
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
      else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (c == '\u212A') sb.append('k')
      else if (c == '\u0130') { sb.append('i'); flush() }
      else flush()
      i += 1
    }
    flush()
    if (out.isEmpty) out += UTF8String.EMPTY_UTF8
    new GenericArrayData(out.toArray)
  }
}
