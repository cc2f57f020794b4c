package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data pipelines, as pure Column
  * expressions (whole-stage-codegen'd higher-order functions — no UDFs,
  * so Catalyst can push/prune around them and nothing leaves the codegen
  * hot path).
  *
  * Every function here has an exact ANSI-SQL mirror (see the oracle SQL
  * in graft.queries.*) built on the same md5-based hashing, so results
  * are engine-independent and deterministic — a requirement for
  * reproducible dedup decisions when a 100 TB corpus is re-sharded.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics, collapse whitespace. By
    * construction the normalized text is exactly the tokens joined by
    * single spaces (tokens are the maximal kept-character runs), so
    * this rides the native tokenizer instead of the two regex passes;
    * the [[TokenizeExpr]] empty-token artifact joins back to the empty
    * string the legacy chain produced. */
  def normalizeText(c: Column): Column = array_join(TokenizeExpr(c), " ")

  /** The regex chain [[normalizeText]] replaced (equivalence reference). */
  def normalizeTextLegacy(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokens of the normalized text — the native one-pass
    * [[TokenizeExpr]] (two regex passes fewer per row; value-identical
    * to [[tokensLegacy]], equivalence pinned in FunctionsSpec). */
  def tokens(c: Column): Column = TokenizeExpr(c)

  /** The declarative normalize→split chain [[tokens]] replaced — the
    * semantic reference the native tokenizer is tested against. */
  def tokensLegacy(c: Column): Column = split(normalizeTextLegacy(c), " ")

  /** Deterministic 60-bit hash of a string: first 15 hex chars of md5.
    * Mirror: `('0x' || substr(md5(s), 1, 15))::BIGINT`. Backed by the
    * native codegen'd [[Hash60Expr]]; [[hash60Legacy]] is the built-in
    * composition it replaced (kept for the equivalence test). */
  def hash60(c: Column): Column = Hash60Expr(c)

  /** The original composite form of [[hash60]] — same value, slower
    * (hex-string materialization + BigInteger radix conversion). */
  def hash60Legacy(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `seed`. */
  def hash60(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** `n`-token shingles ("a b c" strings). Empty array when the doc has
    * fewer than `n` tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Sorted distinct [[hash60]] set of the `n`-token shingles in one
    * native pass ([[ShingleHashExpr]]). Value-identical to the
    * declarative chain
    * `array_sort(array_distinct(transform(shingles(toks, n), hash60)))`
    * (equivalence pinned in FunctionsSpec); empty array below `n`
    * tokens. */
  def hashedShingleSet(toks: Column, n: Int): Column =
    ShingleHashExpr(toks, n)

  /** One MinHash signature component: min over shingles of hash family
    * member `seed`. Null for empty shingle sets.
    *
    * NOTE: md5-per-(shingle × seed) — k seeds cost k md5 passes. Kept as
    * the didactic form; production pipelines use [[minhashMixed]] over a
    * once-computed [[hash60]] array (1 md5 pass + k arithmetic mixes). */
  def minhash(shin: Column, seed: Int): Column =
    array_min(transform(shin, s => hash60(seed, s)))

  /** Mersenne prime 2³¹−1: the universal-hash modulus. Products stay
    * under 2⁶² so the arithmetic is overflow-free in any engine with
    * 64-bit integers (DuckDB raises on BIGINT overflow — this family is
    * chosen to be safe there too). */
  val MixP = 2147483647L

  /** Driver-side constants for universal-hash member `seed`, derived
    * from the same md5 hash family so both engines can regenerate them. */
  def mixConsts(seed: Int): (Long, Long) =
    ((Hash60Impl.hash60String(s"a:$seed") % (MixP - 1)) + 1,
      Hash60Impl.hash60String(s"b:$seed") % MixP)

  /** Universal-hash re-mix of a base hash: `(a·(h mod p) + b) mod p`.
    * One md5 per shingle total, k cheap mixes — the scale form of a
    * k-member hash family. */
  def mix(h: Column, seed: Int): Column = {
    val (a, b) = mixConsts(seed)
    ((h % MixP) * a + b) % MixP
  }

  /** MinHash component `seed` over a PRE-COMPUTED hash array (stage
    * `transform(shin, hash60)` as a real column first so the md5 pass
    * runs once per row, not once per reference). */
  def minhashMixed(shinHashes: Column, seed: Int): Column =
    array_min(transform(shinHashes, h => mix(h, seed)))

  /** k-bit SimHash over tokens: bit b is the sign of the ±1 vote sum of
    * each token's hash bit b. The per-bit fold stays inside codegen;
    * `bits` ≤ 32 keeps expression size sane (64-bit production variant
    * is the same shape over two 32-bit halves). */
  def simhash(toks: Column, bits: Int): Column =
    simhashOnHashes(transform(toks, t => hash60(t)), bits)

  /** SimHash over a PRE-COMPUTED token-hash array. Stage the hash array
    * as a real column first: the `bits` per-bit folds then traverse a
    * small long array instead of re-running md5 per (token × bit). */
  def simhashOnHashes(tokHashes: Column, bits: Int): Column =
    (0 until bits).map { b =>
      when(aggregate(tokHashes, lit(0L),
        (acc, h) => acc + when((shiftright(h, b) % 2) === 1, 1L).otherwise(-1L)
      ) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Count of tokens present in `stopwords` (multiset semantics). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords))).cast("long")

  /** Exact-content fingerprint: md5 of the normalized text. */
  def fingerprintExact(c: Column): Column = md5(normalizeText(c))

  /** Order/duplication-insensitive fingerprint: md5 over the sorted
    * distinct token set — detects shuffled near-copies. */
  def fingerprintShuffle(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))
}
