package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.StagedCache

/** Fixed-iteration PageRank over an undirected edge list, in EXACT
  * integer arithmetic — the graph-analytics companion to
  * [[ConnectedComponents]] (same input shape: verified near-dup pairs,
  * citation edges, any symmetric relation).
  *
  * Semantics (the "un-normalized" per-node form, damping d = 0.85):
  * every node starts at rank 1.0; each iteration,
  *
  *   rank'(v) = 0.15 + 0.85 * Σ_{u ~ v} rank(u) / deg(u)
  *
  * Determinism across engines is by construction, not by rounding
  * tolerance: ranks live in 64-bit MICRO-UNITS (1.0 = 1_000_000) and
  * each neighbor contribution is the integer division
  * `(rank_u * 85) div (100 * deg)` — addition of longs is associative
  * and commutative, so any partial-aggregation order, any sharding, and
  * any engine produces the SAME bits (the q_kmeans micro-unit
  * precedent, applied to the iteration itself rather than just the
  * presentation). DuckDB mirrors one iteration per CTE with `//`.
  *
  * Plan shape (scale): the symmetrized edge list joined with the
  * degree table is staged ONCE ([[StagedCache]]) and re-read every round;
  * each of the `iters` rounds is one broadcast-free equi-join
  * (ranks ⋈ edges on src — both sides hash-partitioned on the node id)
  * plus one partial-aggregated sum keyed on dst. Nothing is collected
  * to the driver; lineage depth is `iters` (fixed and small — an
  * unbounded-round variant would localCheckpoint per round like
  * [[ConnectedComponents]]). At 100 TB the edge table is the dataset:
  * rounds are data-linear, and the rank table is node-sized (smaller).
  *
  * Every node of a symmetrized edge list has deg ≥ 1 and appears as
  * both src and dst, so inner joins lose no node and the dangling-mass
  * term of the normalized formulation does not arise.
  *
  * Reference analogue: the reference's engine has no graph surface; the
  * operator extends SURVEY §2's iterative-aggregation family
  * (trace-insertindex-job's reducer loop is one-shot) the same way
  * [[ConnectedComponents]] does — driver coordinates rounds, data never
  * leaves the cluster.
  */
object PageRank {

  val DampNum = 85L  // 0.85 in percent — integer damping
  val BaseU   = 150000L // (1 - 0.85) in micro-units
  val OneU    = 1000000L // rank 1.0 in micro-units

  /** Ranks after `iters` rounds over the undirected pairs in
    * (`aCol`, `bCol`). Output: `node_id`, `rank_u` (micro-units,
    * exact), unordered — presentation sorts are the caller's. */
  def apply(pairs: DataFrame, aCol: String, bCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"pagerank needs iters >= 1, got $iters")
    // Staged: `sym` is read by deg, by the edge build, AND by ranks0
    // (through deg) — without the cache the upstream candidate
    // pipeline (for near-dup graphs: the banded-LSH join + verify)
    // recomputes for the ranks0 consumer (r17 A/B at sf0.1, 7-sample
    // medians: 2.37 s → 2.03 s, and the recompute's extra jobs were
    // the query's widest noise amplifier — full-suite spread max 33 s
    // before, bounded after).
    val sym = StagedCache.persist(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst"))))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    // Staged: every round re-reads (src, dst, deg); recomputing would
    // re-run the degree join per round.
    val edges = StagedCache.persist(sym.join(deg, "src"))
    val ranks0 = deg.select(col("src").as("node_id"), lit(OneU).as("rank_u"))
    (1 to iters).foldLeft(ranks0) { (ranks, _) =>
      edges.join(ranks, edges("src") === ranks("node_id"))
        .select(col("dst"),
          expr(s"(rank_u * $DampNum) div (100 * deg)").as("contrib_u"))
        .groupBy("dst")
        .agg((lit(BaseU) + sum(col("contrib_u"))).as("rank_u"))
        .select(col("dst").as("node_id"), col("rank_u"))
    }
  }
}
