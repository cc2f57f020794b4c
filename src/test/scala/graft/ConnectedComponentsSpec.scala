package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Direct tests for the min-label-propagation CC operator backing
  * q_dedup_clusters: multi-round chains, stars, multiple components,
  * and the partitioning-invariance the oracle comparison relies on. */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  private def cc(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents(edges.toDF("a", "b").repartition(parts), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a chain needs multiple propagation rounds and still converges to the min") {
    // 9-8-7-...-1: the min label must travel the whole chain.
    val chain = (1L to 8L).map(i => (i + 1, i))
    assert(cc(chain) == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("star, pair, and singleton-pair components get component minima") {
    val edges = Seq(
      (10L, 11L), (10L, 12L), (10L, 13L), // star centered at 10
      (20L, 21L),                         // pair
      (31L, 30L))                         // reversed pair
    val got = cc(edges)
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("two components merged by a bridge edge collapse to one min") {
    val edges = Seq((5L, 6L), (7L, 8L), (6L, 7L))
    assert(cc(edges).values.toSet == Set(5L))
  }

  test("labels are invariant under input partitioning") {
    val edges = (1L to 30L).map(i => (i, i % 10 + 100L)) // 10 stars
    assert(cc(edges, parts = 1) == cc(edges, parts = 13))
  }

  test("maxRounds cap over-segments but never wrongly merges") {
    // A long chain with rounds capped at 1: every node still gets a
    // label from its own component (a neighbor's id or its own).
    val chain = (1L to 15L).map(i => (i + 1, i))
    val s = spark
    import s.implicits._
    val got = ConnectedComponents(chain.toDF("a", "b"), "a", "b", maxRounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (node, lab) =>
      assert(lab <= node && node - lab <= 2, s"label $lab too far from $node")
    }
  }

  test("label partition count is data-proportional, not core-count-proportional") {
    // At bench scale the per-round cost is fixed overhead × partition
    // count; tiny inputs must collapse to ONE label partition no matter
    // how many cores (or input partitions) the box has.
    val s = spark
    import s.implicits._
    val edges = (1L to 50L).map(i => (i, i + 1000L)).toDF("a", "b").repartition(8)
    val r = ConnectedComponents.run(edges, "a", "b")
    assert(r.converged)
    assert(r.labels.rdd.getNumPartitions == 1,
      s"expected 1 pinned label partition, got ${r.labels.rdd.getNumPartitions}")
  }

  test("empty edge set converges with no labels") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val r = ConnectedComponents.run(empty, "a", "b")
    assert(r.converged)
    assert(r.labels.collect().isEmpty)
  }

  test("run() reports non-convergence machine-readably; strict apply throws") {
    val s = spark
    import s.implicits._
    val chain = (1L to 15L).map(i => (i + 1, i)).toDF("a", "b")
    val capped = ConnectedComponents.run(chain, "a", "b", maxRounds = 1)
    assert(!capped.converged && capped.rounds == 1)
    val full = ConnectedComponents.run(chain, "a", "b")
    assert(full.converged && full.rounds >= 2)
    assert(full.labels.collect().map(_.getLong(1)).forall(_ == 1L))
    val e = intercept[IllegalStateException] {
      ConnectedComponents(chain, "a", "b", maxRounds = 1, strict = true)
    }
    assert(e.getMessage.contains("NOT converged"))
  }
}
