package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Pins [[graft.operators.PageRank]] against a plain-Scala integer
  * model on hand graphs: the operator's distributed join/agg rounds
  * must reproduce the reference arithmetic BIT-FOR-BIT (that is the
  * operator's whole determinism claim), and structural symmetries of
  * the graph must appear as exactly equal ranks.
  */
class PageRankSpec extends AnyFunSuite with SparkSpec {

  /** Reference model: same micro-unit integer arithmetic, sequential. */
  private def model(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = pairs ++ pairs.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var rank = deg.keys.map(_ -> PageRank.OneU).toMap
    for (_ <- 1 to iters) {
      val contribs = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          (rank(src) * PageRank.DampNum) / (100L * deg(src))
        }.sum
      }
      rank = rank.keys.map(n => n -> (PageRank.BaseU + contribs(n))).toMap
    }
    rank
  }

  private def run(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    PageRank(pairs.toDF("a", "b"), "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph a-b-c: operator matches the integer model bit-for-bit") {
    val pairs = Seq((1L, 2L), (2L, 3L))
    for (iters <- 1 to 4)
      assert(run(pairs, iters) == model(pairs, iters), s"iters=$iters")
  }

  test("star graph: center accumulates leaf mass; leaves stay equal") {
    val pairs = (2L to 9L).map(l => (1L, l))
    val got = run(pairs, 3)
    assert(got == model(pairs, 3))
    val leaves = (2L to 9L).map(got)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
    assert(got(1L) > leaves.head, "hub must outrank leaves")
  }

  test("two disconnected components do not exchange mass") {
    val comp1 = Seq((1L, 2L), (2L, 3L))
    val comp2 = Seq((10L, 11L), (11L, 12L))
    val joint = run(comp1 ++ comp2, 3)
    val alone1 = run(comp1, 3)
    val alone2 = run(comp2, 3)
    assert(joint == alone1 ++ alone2)
  }

  test("ring graph: every node identical; total mass conserved up to div flooring") {
    val n = 6L
    val pairs = (1L to n).map(i => (i, i % n + 1))
    val got = run(pairs, 3)
    assert(got.values.toSet.size == 1, "ring symmetry must tie all ranks")
    // deg=2 everywhere: each round maps r -> 150000 + 2*(85r div 200).
    // Flooring loses < 1 micro-unit per edge per round; mass stays near n.
    val total = got.values.sum
    assert(total <= n * PageRank.OneU && total > n * PageRank.OneU - n * 3 * 2)
  }
}
