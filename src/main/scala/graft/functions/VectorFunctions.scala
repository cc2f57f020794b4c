package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as Column
  * expressions.
  *
  * Accumulation discipline: every reduction is a sequential left fold in
  * DOUBLE (`aggregate` / `zip_with`), which is bit-identical to DuckDB's
  * `list_sum(list_transform(...))` on `::DOUBLE` — verified empirically —
  * so similarity thresholds cut identically in both engines. Don't swap
  * in float SIMD kernels on the oracle path.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖v‖₂ in double precision. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic pseudo-random hyperplane component for plane `j`,
    * dimension `i` (1-based Column): md5-hash mapped to [-1, 1].
    * At production scale you'd materialize the planes once and broadcast
    * them; the inline-expression form keeps the operator fully
    * declarative and oracle-mirrorable. */
  def planeComponent(j: Int, i: Column): Column =
    ((TextFunctions.hash60(concat(lit(s"p$j:"), i.cast("string"))) % 2001L)
      - 1000L).cast("double") / 1000.0

  /** Σ vᵢ·planeⱼᵢ — projection of `v` (array<float>, `dim` components)
    * onto deterministic hyperplane `j`. */
  def planeDot(v: Column, j: Int, dim: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(dim)),
        i => element_at(v, i).cast("double") * planeComponent(j, i)),
      lit(0.0), (acc, x) => acc + x)

  /** `nPlanes`-bit random-hyperplane LSH bucket id (sign signature). */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { j =>
      when(planeDot(v, j, dim) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
