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

  /** [[apply]] with a machine-readable outcome instead of a stderr line. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxRounds: Int = 20): Result = {
    val sym = StagedCache.persist(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"))))
    // Initial labels already fold in one propagation step — min(self,
    // direct neighbors) — without a changed-count job: star-shaped
    // components (the common near-dup cluster) converge immediately
    // and pay only the single confirming round.
    var labels = sym.select(col("src").as("node_id"), col("dst").as("cluster_id"))
      .union(sym.select(col("src").as("node_id"), col("src").as("cluster_id")))
      .groupBy("node_id").agg(min("cluster_id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaNbr = sym
        .join(labels.select(col("node_id").as("dst"), col("cluster_id")), "dst")
        .select(col("src").as("node_id"), col("cluster_id"))
      // ONE job per round: the changed-count rides the eager
      // checkpoint's materialization as an observed metric instead of a
      // second join+count action (halves the per-round fixed job
      // overhead that dominates this operator at bench scale — the
      // data-volume cost is unchanged). The prev-label join keys are
      // both hash-partitioned on node_id, so the fusion adds no
      // corpus-sized exchange.
      val obs = org.apache.spark.sql.Observation()
      val next = labels.select(col("node_id"), col("cluster_id")).union(viaNbr)
        .groupBy("node_id").agg(min("cluster_id").as("cluster_id"))
        .join(labels.select(col("node_id"), col("cluster_id").as("prev")), "node_id")
        .observe(obs, sum(when(col("cluster_id") =!= col("prev"), 1L)
          .otherwise(0L)).as("changed"))
        .select("node_id", "cluster_id")
        .localCheckpoint(true)
      // Defensive fallback: if the checkpoint action ever stops
      // delivering observed metrics (an internal-wiring property, not a
      // contract), fall back to the explicit count rather than hanging
      // on a blocking get() or mis-reporting convergence.
      // NonFatal, not just TimeoutException: a SparkException delivered
      // through the metrics future must also take the fallback path, and an
      // interrupt falls back too after restoring the thread's interrupt
      // status (NonFatal deliberately excludes InterruptedException).
      val changed: Long = (try {
        Option(scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(30, "s")).getAs[Any]("changed"))
      } catch {
        case scala.util.control.NonFatal(_) => None
        case _: InterruptedException => Thread.currentThread().interrupt(); None
      }) match {
        case Some(n: java.lang.Long) => n.longValue()
        case _ => next
          .join(labels.withColumnRenamed("cluster_id", "prev"), "node_id")
          .filter(col("cluster_id") =!= col("prev")).count()
      }
      labels = next
      converged = changed == 0
      rounds += 1
    }
    Result(labels, converged, rounds)
  }
}
