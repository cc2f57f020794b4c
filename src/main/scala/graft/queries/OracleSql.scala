package graft.queries

/** DuckDB SQL fragments mirroring [[graft.functions.TextFunctions]] /
  * [[graft.functions.VectorFunctions]] exactly — same normalization, same
  * md5-based hash family, same double-precision fold order — so oracle
  * results hash-match the Spark results bit-for-bit.
  */
object OracleSql {

  /** Mirror of `TextFunctions.normalizeText`. */
  def norm(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Mirror of `TextFunctions.tokens` (split of the normalized text). */
  def toks(c: String): String = s"string_split(${norm(c)}, ' ')"

  /** Mirror of `TextFunctions.hash60`: first 15 hex chars of md5 as a
    * 60-bit BIGINT. */
  def hash60(e: String): String = s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** Half-up integer micro-share num/den · 1e6 (0 when den = 0), the
    * ONE definition both engines derive from — see [[shareUSpark]] for
    * the Spark twin. The zero-guard matters under ANSI mode, where a
    * bare `DIV 0` throws while DuckDB's `//` returns NULL. Exact below
    * ~4.6e12 per numerator (num·2e6 must fit BIGINT); beyond that,
    * pre-scale the counts. */
  def shareU(num: String, den: String): String =
    s"(CASE WHEN $den = 0 THEN 0 ELSE ($num * 1000000 * 2 + $den) // (2 * $den) END)::BIGINT"

  /** Spark-side twin of [[shareU]] (an expr-string over column names,
    * so the integer DIV stays integer). */
  def shareUSpark(num: String, den: String): String =
    s"CAST(CASE WHEN $den = 0 THEN 0 ELSE ($num * 1000000 * 2 + $den) DIV (2 * $den) END AS BIGINT)"

  /** Mirror of the seeded variant `TextFunctions.hash60(seed, c)`. */
  def hash60Seeded(seed: Int, e: String): String =
    hash60(s"'$seed:' || $e")

  /** Mirror of `TextFunctions.shingles(toks, n)` given a token-list
    * expression (assumes the list is named/aliased, referenced twice). */
  def shingles(toksExpr: String, n: Int): String = {
    val parts = (0 until n).map(k => if (k == 0) s"$toksExpr[i]" else s"$toksExpr[i+$k]")
      .mkString(" || ' ' || ")
    s"list_transform(generate_series(1, len($toksExpr) - ${n - 1}), i -> $parts)"
  }

  /** Mirror of `VectorFunctions.dot` on FLOAT[] columns (sequential
    * double fold in index order). */
  def dot(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  /** Mirror of `VectorFunctions.l2Norm`. */
  def l2Norm(v: String, dim: Int): String = s"sqrt(${dot(v, v, dim)})"

  /** Mirror of `VectorFunctions.microUnits`: the embedding as exact
    * integer micro-units (BIGINT[]). */
  def microUnits(v: String): String =
    s"list_transform($v, x -> CAST(round(x::DOUBLE * 1e6) AS BIGINT))"

  /** Mirror of `VectorFunctions.dotLong` on BIGINT[] operands (exact
    * integer sum; the ::BIGINT narrows DuckDB's HUGEINT list_sum). */
  def dotLong(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> $a[i] * $b[i]))::BIGINT"

  /** Mirror of `graft.operators.SkewGuard.capBuckets`: the capped
    * sub-bucket key `"<bucket>:<salt>"`, given the bucket expression,
    * the member-id expression, a per-bucket size expression (e.g. a
    * `count(*) OVER (PARTITION BY bucket)` alias), and the cap. */
  def cappedBucket(bucket: String, id: String, bsz: String, cap: Int): String =
    s"(($bucket)::VARCHAR || ':' || ((${hash60(s"'split:' || ($id)::VARCHAR")}) " +
      s"% ceil(($bsz) / $cap.0)::BIGINT)::VARCHAR)"

  /** A DuckDB DOUBLE[] literal for a materialized hyperplane. */
  def planeLiteral(plane: Array[Double]): String =
    plane.mkString("([", ", ", "]::DOUBLE[])")

  /** Mirror of `VectorFunctions.planeDot` (rounded projection). */
  def planeDot(v: String, plane: Array[Double], dim: Int): String =
    s"round(list_sum(list_transform(generate_series(1, $dim), i -> $v[i]::DOUBLE * ${planeLiteral(plane)}[i])), 6)"

  /** Mirror of `VectorFunctions.lshBucket`. */
  def lshBucket(v: String, planes: Array[Array[Double]], dim: Int): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${planeDot(v, p, dim)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")
}
