package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as Column
  * expressions.
  *
  * Accumulation discipline: every reduction is a sequential left fold in
  * DOUBLE (`aggregate` / `zip_with`), which matches DuckDB's
  * `list_sum(list_transform(...))` on `::DOUBLE` operands, so similarity
  * thresholds cut identically in both engines. Don't swap in float SIMD
  * kernels on the oracle path.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision — native codegen'd expression
    * ([[DotProductExpr]]); [[dotHof]] is the declarative form it
    * replaced (same fold, interpreted — kept for the equivalence
    * test). */
  def dot(a: Column, b: Column): Column = DotProductExpr(a, b)

  /** Higher-order-function form of [[dot]] (identical arithmetic). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖v‖₂ in double precision. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** The float embedding in exact integer micro-units:
    * eᵤ[i] = round(vᵢ·1e6) as long. The carrier type of the Lloyd /
    * k-means chain — every distance, mean, and inertia downstream is
    * integer arithmetic on these, so no representable-half double
    * rounding can diverge between engines. Mirror:
    * `list_transform(v, x -> CAST(round(x::DOUBLE * 1e6) AS BIGINT))`. */
  def microUnits(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1e6).cast("long"))

  /** Σ aᵢ·bᵢ over `array<bigint>` operands, exact — native codegen'd
    * ([[DotLongExpr]]); [[dotLongHof]] is the declarative twin. */
  def dotLong(a: Column, b: Column): Column = DotLongExpr(a, b)

  /** Higher-order-function form of [[dotLong]] (identical integers). */
  def dotLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Σ (aᵢ−bᵢ)² — squared Euclidean distance, double precision.
    * Subtraction-then-multiply (no pow) so DuckDB mirrors bit-for-bit. */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Pure-Scala md5-based 60-bit hash — same value as
    * [[TextFunctions.hash60]] so driver-side constants and executor-side
    * expressions share one hash family. */
  def hash60Scala(s: String): Long = Hash60Impl.hash60String(s)

  /** Deterministic random-hyperplane matrix, materialized ONCE on the
    * driver (components in [-1, 1], 3 exact decimal digits so literals
    * parse to identical doubles in any engine). Shipped to executors as
    * plan literals — i.e. broadcast with the serialized plan, never
    * recomputed per row. This replaces the earlier per-row md5 scheme
    * (2048 md5 evals/row at 128-dim × 16 planes) that would have been the
    * slowest scan stage in the pipeline. */
  def planeMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    // ≤ 63 planes: bucket bits live in one signed long, and 1L << j
    // wraps at 64 (shift count mod 64) — plane 64's vote would
    // silently alias onto plane 0's bit in BOTH the native and HOF
    // forms, quietly degrading the whole LSH family.
    require(nPlanes >= 1 && nPlanes <= 63,
      s"planeMatrix supports 1..63 planes, got $nPlanes")
    Array.tabulate(nPlanes, dim) { (j, i0) =>
      ((hash60Scala(s"p$j:${i0 + 1}") % 2001L) - 1000L) / 1000.0
    }
  }

  /** Projection of `v` (array<float>) onto one materialized plane,
    * rounded to 6 dp so the sign test is stable across engines. */
  def planeDot(v: Column, plane: Array[Double]): Column =
    round(aggregate(
      zip_with(v, typedLit(plane.toSeq), (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x), 6)

  /** Sign-signature LSH bucket id over the materialized plane matrix:
    * bit j set ⇔ v · planeⱼ > 0. Collision probability between two
    * vectors decays with their angle — vectors in the same bucket are
    * cosine-similar candidates, so ANN search only compares within
    * buckets (the 100 TB path: a bucket-key shuffle instead of an
    * all-pairs cross join). Native one-pass expression
    * ([[PlaneBucketExpr]]); [[lshBucketHof]] is the declarative form
    * it replaced (bit-identity asserted in FunctionsSpec). */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    PlaneBucketExpr(v, planes)

  /** Higher-order-function form of [[lshBucket]] (identical
    * arithmetic: per-plane sequential fold, 6-dp round, sign bit). */
  def lshBucketHof(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(planeDot(v, p) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
