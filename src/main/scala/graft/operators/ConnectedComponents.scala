package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.StagedCache

/** Connected components over an undirected edge list by
  * iterate-to-convergence min-label propagation: every node's label
  * converges to its component's minimum node id.
  *
  * Scale shape: each round is ONE distributed equi-join (edges ×
  * labels) plus ONE aggregation (min label per node) — the standard
  * large-graph CC kernel (≙ GraphX's connectedComponents, which is not
  * on this classpath). The driver only coordinates rounds and checks
  * the changed-count; rounds = O(component diameter), which for
  * near-dup clusters is shallow. `maxRounds` guards pathological
  * chains — a cap-out is machine-detectable, never silent: [[run]]
  * returns a `converged` flag (and the round count), and [[apply]]
  * with `strict = true` throws instead of returning over-segmented
  * labels. Capped labels remain a valid refinement (over-segmented,
  * never wrongly merged) but are not the exact component minima.
  * Raise `maxRounds` to resolve exactly.
  *
  * Deterministic: labels are pure min-aggregations of node ids — no
  * partitioning dependence — so a sequential model (or a recursive SQL
  * CTE, see `q_dedup_clusters`'s oracle) reproduces them exactly.
  *
  * Each round's labels go through `localCheckpoint` — lineage
  * TRUNCATION, not just caching: persist() alone keeps the logical
  * plan, which references the previous round twice (union + change
  * check) and therefore doubles per round — an 8-round chain OOMs the
  * driver on plan analysis alone. Checkpointing keeps plans O(1) per
  * round; the checkpointed blocks are freed by the context cleaner.
  * The edge table persists through [[StagedCache]]; run inside a
  * harness that releases per query (Bench/Verify/tests) or under
  * `StagedCache.withScope`.
  */
object ConnectedComponents {

  /** Labels plus the convergence outcome: `converged = false` means the
    * round cap was hit and `labels` are over-segmented (a refinement of
    * the true components — never a wrong merge). `rounds` counts the
    * propagation rounds actually executed after initialization. */
  final case class Result(labels: DataFrame, converged: Boolean, rounds: Int)

  /** @param edges DataFrame with two long node-id columns
    * @return (node_id, cluster_id = component-min node id)
    * @param strict throw [[IllegalStateException]] instead of returning
    *               over-segmented labels when `maxRounds` is exhausted —
    *               for callers that cannot tolerate silent refinements;
    *               flag-inspecting callers use [[run]]. */
  def apply(edges: DataFrame, srcCol: String, dstCol: String,
            maxRounds: Int = 20, strict: Boolean = false): DataFrame = {
    val r = run(edges, srcCol, dstCol, maxRounds)
    if (!r.converged) {
      val msg = s"ConnectedComponents: NOT converged after $maxRounds rounds — " +
        "labels are over-segmented (component diameter exceeds the round cap); " +
        "raise maxRounds to resolve exactly"
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"[graft] $msg")
    }
    r.labels
  }

  /** Rows per label partition inside the propagation loop: (long, long)
    * label rows are 16 bytes, so 4 M rows ≈ 64 MB — the small end of the
    * 100 MB–1 GB healthy-partition band, chosen low because every round
    * pays per-partition fixed cost THREE times (shuffle task + eager
    * checkpoint block + changed-count scan). */
  private val RowsPerLabelPartition = 4L * 1024 * 1024

  /** [[apply]] with a machine-readable outcome instead of a stderr line. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxRounds: Int = 20): Result = {
    val sym = StagedCache.persist(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
    // Pin the label table's partition count to the DATA, not the box:
    // per-round cost (shuffle tasks, eager-checkpoint blocks, the
    // changed-count scan) is proportional to this count, and deriving it
    // from `spark.sql.shuffle.partitions` (= core count here) made
    // rounds SLOWER on bigger boxes at fixed data size. The count also
    // materializes the staged edge table once, before the loop.
    val edgeRows = sym.count()
    val labelParts = math.max(1L, math.min(
      sym.sparkSession.sessionState.conf.numShufflePartitions.toLong,
      (edgeRows + RowsPerLabelPartition - 1) / RowsPerLabelPartition)).toInt
    // Initial labels already fold in one propagation step — min(self,
    // direct neighbors) — without a changed-count job: star-shaped
    // components (the common near-dup cluster) converge immediately
    // and pay only the single confirming round.
    var labels = sym.select(col("src").as("node_id"), col("dst").as("cluster_id"))
      .union(sym.select(col("src").as("node_id"), col("src").as("cluster_id")))
      .repartition(labelParts, col("node_id"))
      .groupBy("node_id").agg(min("cluster_id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaNbr = sym
        .join(labels.select(col("node_id").as("dst"), col("cluster_id")), "dst")
        .select(col("src").as("node_id"), col("cluster_id"))
      // The changed-count rides the checkpointed rows as a `chg` column:
      // the eager checkpoint materializes it, and the count is then one
      // trivial aggregation over the cached blocks — no shuffle of data,
      // no listener-bus dependency. (The previous implementation awaited
      // an `Observation` future here; observed-metric delivery rides the
      // asynchronous listener bus, which under a busy 32-core suite can
      // lag or drop the query-end event, turning a ~1 s round into a
      // 30 s Await timeout plus a fallback count — the measured
      // [1.3 s, 34 s] spread on the same query.)
      val next = labels.select(col("node_id"), col("cluster_id")).union(viaNbr)
        .repartition(labelParts, col("node_id"))
        .groupBy("node_id").agg(min("cluster_id").as("cluster_id"))
        .join(labels.select(col("node_id"), col("cluster_id").as("prev")), "node_id")
        .select(col("node_id"), col("cluster_id"),
          (col("cluster_id") =!= col("prev")).as("chg"))
        .localCheckpoint(true)
      val changed: Long = next
        .agg(count(when(col("chg"), lit(1))).as("changed"))
        .first().getLong(0)
      labels = next.select("node_id", "cluster_id")
      converged = changed == 0
      rounds += 1
    }
    Result(labels, converged, rounds)
  }
}
