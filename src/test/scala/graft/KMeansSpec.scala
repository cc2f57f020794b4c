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
}
