package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/** Pins the q_kmeans trainer's defining property: Lloyd iterations
  * never increase total inertia (each assign step is a per-vector
  * argmin; each recompute step is the per-cell mean, the L2-optimal
  * center). A wrong argmin order, a mean computed over the wrong key,
  * or a distance formula drift all break the monotone chain. (The
  * micro-unit rounding perturbs each step by ≤1e-6 per vector — far
  * below the inertia drops on this data — so the assertion holds with
  * a zero tolerance.)
  */
class KMeansSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def totalInertia(iters: Int): Long =
    VectorQueries.kmeansReport(spark, sf, iters)
      .collect().map(_.getLong(2)).sum

  test("total inertia is non-increasing across Lloyd iterations") {
    val chain = (1 to 3).map(totalInertia)
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"inertia rose across an iteration: $chain")
    }
    // And training actually moves: the first iteration must improve on
    // the seed assignment by a visible margin, or the trainer is a
    // no-op dressed as one.
    assert(chain.last < chain.head, s"training changed nothing: $chain")
  }

  test("µ²-unit distance chain is integer-exact on planted half-point geometry") {
    // The r7–r9 q_kmeans hash-red: distances carried as 6-dp-rounded
    // doubles land on representable halves that round engine-
    // dependently. The fixed chain carries ‖e−c‖²·1e12 as exact longs
    // via the norm identity n2u + c2u − 2·eᵤ·cᵤ. Plant difference
    // vectors whose squared distance sits EXACTLY on a half-µ point
    // (Σd² ≡ 500000 mod 1e6 — e.g. 700² + 100² = 500000): under the
    // old chain these were coin flips; now the DataFrame expression
    // must equal the BigInt model to the last digit, with zero
    // tolerance, at any magnitude the corpus can produce.
    val s = spark
    import s.implicits._
    import graft.functions.VectorFunctions.dotLong
    import org.apache.spark.sql.functions.{col, lit}
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      // half-point: Σd² = 500000
      (Seq(1000700L, 100L, 0L, 7L), Seq(1000000L, 0L, 0L, 7L)),
      // half-point at corpus magnitude (components ~6e5 µ)
      (Seq(577350L, -577350L, 700L, 100L), Seq(577350L, -577350L, 0L, 0L)),
      // another half decomposition: 500² + 400² + 300² = 500000
      (Seq(-500L, 400L, -300L, 0L), Seq(0L, 0L, 0L, 0L)),
      // off-half controls
      (Seq(1L, 2L, 3L, 4L), Seq(4L, 3L, 2L, 1L)),
      (Seq(599999L, -599999L, 599999L, -599999L), Seq(0L, 1L, -1L, 0L)))
    val got = cases.toDF("e_u", "c_u")
      .select(col("e_u"), col("c_u"),
        (dotLong(col("e_u"), col("e_u")) + dotLong(col("c_u"), col("c_u"))
          - lit(2L) * dotLong(col("e_u"), col("c_u"))).as("dist_u"))
      .collect()
    got.foreach { r =>
      val d = r.getSeq[Long](0).zip(r.getSeq[Long](1))
        .map { case (x, y) => BigInt(x - y).pow(2) }.sum
      assert(BigInt(r.getLong(2)) == d,
        s"dist_u ${r.getLong(2)} != exact $d for ${r.getSeq[Long](0)}")
    }
    assert(got.count(_.getLong(2) % 1000000L == 500000L) == 3,
      "planted half-point distances must survive exactly")
  }
}
