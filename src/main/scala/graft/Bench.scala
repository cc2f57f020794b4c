package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the sf dir in
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology (each defends against a measured failure mode):
  *  - The timed action is a noop-format write (`format("noop")`), which
  *    consumes every output column — unlike `count()`, under which
  *    Catalyst prunes unreferenced projections and a 10-column compute
  *    benches as a bare scan.
  *  - Every query gets ONE untimed warm-up run before its timed runs:
  *    a single-pass harness conflates JIT/codegen compilation and
  *    suite-position JVM state with the query's cost (observed: a
  *    code-unchanged query swinging 2.15× round-over-round).
  *  - Each query is then timed `iters` times (default 3) and the MEDIAN
  *    is reported — robust to one GC pause or compilation stall in a
  *    way a single sample or a mean is not. Per-query min/max spread is
  *    emitted alongside so a noisy median is visible as such.
  *  - ADAPTIVE extension: if the spread is wide relative to the median
  *    ((max−min)/median > 0.35 — the regime of sub-second queries,
  *    whose absolute noise floor on a busy host rivals their cost),
  *    up to `maxIters` (default 7) total samples are taken before the
  *    median is read. Measured: without this, identical code showed
  *    2× run-over-run ratios on ~0.3 s queries while totals moved 1%.
  *  - Staged caches are released between runs, so every timed run pays
  *    the query's full staging cost (the number reported is the
  *    cold-cache cost of one query execution, not an artifact of
  *    cross-run cache reuse).
  *  - CRASH-SAFE artifact: the JSON artifact file is rewritten after
  *    EVERY completed query (complete=false until the suite ends), so
  *    an external kill at any point leaves a parseable file with every
  *    finished query's median+spread. Round 6's driver bench died to a
  *    host-steal timeout (rc 124) with zero machine-readable output —
  *    this flush is the fix.
  *  - WALL-CLOCK BUDGET: SPARK_GRAFT_BENCH_BUDGET_SEC (default 1800)
  *    bounds the whole run from JVM start. When the deadline passes,
  *    no new query or extra adaptive sample is started; queries with
  *    at least one timed sample report the median of what they have,
  *    untouched queries land in `skipped`, and the final line carries
  *    "budget_exceeded":true. A slow host now degrades the artifact
  *    instead of destroying it.
  *  - GRACEFUL DEGRADATION LADDER ([[Bench.samplingPlan]]): under
  *    budget pressure the harness sheds sampling PRECISION before it
  *    sheds query COVERAGE — adaptive re-sampling stops at 50% of
  *    budget, iters drop to 2 at 70%, to 1 at 85%, and at 95% even
  *    the per-query warm-up is dropped (the suite preheat has already
  *    absorbed the JIT storm; a warm-up at that point doubles exactly
  *    the cost the budget can no longer afford) — because a
  *    one-sample timing for every query is strictly better evidence
  *    than seven samples for two-thirds of the suite and `skipped`
  *    for the rest (the round-6/7 failure shape: a noisy host's
  *    adaptive extras ate the budget tail-first). A cost PROJECTION
  *    ([[Bench.projectedLevel]]) from the measured per-sample cost
  *    engages each level as soon as the projected suite finish
  *    exceeds the budget — on a long suite the elapsed-fraction
  *    thresholds alone react too late.
  *  - DE-SHADOWED ordering: a GC + settle pause runs between queries
  *    (outside any timed interval) so one query's garbage is not
  *    collected inside its alphabetical neighbor's samples — round 6
  *    saw the two new heavy queries elevate six code-unchanged
  *    neighbors. SPARK_GRAFT_BENCH_SEED additionally shuffles suite
  *    order deterministically, so two runs with different seeds
  *    put different neighbors adjacent: position-dependent noise then
  *    shows up as cross-seed disagreement instead of masquerading as a
  *    per-query regression.
  *  - UNTIMED PREHEAT: a 4-seed cross-order A/B (PLANS.md round-7
  *    notes) showed the flagship-only session warm-up leaves an
  *    early-suite JIT/codegen storm that elevates WHATEVER queries a
  *    permutation places at positions 0–5 by 2–4× — reproducibly per
  *    order, so it masquerades as a per-query regression. Before the
  *    timed suite, one representative of each major physical shape
  *    (shuffle+broadcast join, window sort, hash aggregate, the
  *    tokenize/explode/LSH text path, the custom as-of plan) runs
  *    untimed at the benched sf, absorbing the storm
  *    position-independently (`SPARK_GRAFT_BENCH_PREHEAT` overrides
  *    the list; empty disables).
  *
  * Failures are reported in `failed`, never as timings.
  */
object Bench {
  /** Render the artifact line. Pure — spec'd by BenchArtifactSpec so the
    * "always parseable, at every prefix of the suite" property is pinned
    * without running Spark.
    */
  /** The five degradation levels: 0 = full sampling (adaptive extras
    * allowed), 1 = base iters only, 2 = two samples, 3 = one sample,
    * 4 = one sample with NO per-query warm-up (the suite-level preheat
    * has already absorbed the JIT storm, and at the deepest level the
    * warm-up doubles exactly the cost the budget can no longer afford).
    * Pure — pinned by BenchArtifactSpec. */
  def planAtLevel(level: Int, iters: Int, maxIters: Int): (Int, Int) = level match {
    case 0          => (iters, maxIters)
    case 1          => (iters, iters) // base iters, no adaptive extras
    case 2          => (math.min(iters, 2), math.min(iters, 2))
    case _          => (1, 1)
  }

  /** Whether a query at this level still gets its untimed warm-up run. */
  def warmupAtLevel(level: Int): Boolean = level < 4

  /** Budget-pressure sampling plan: (target iters, max adaptive iters)
    * for a query starting at `frac` = elapsed/budget. `frac` ≤ 0 (no
    * budget) keeps full sampling. */
  def samplingPlan(frac: Double, iters: Int, maxIters: Int): (Int, Int) =
    planAtLevel(levelFor(frac), iters, maxIters)

  def levelFor(frac: Double): Int =
    if (frac <= 0) 0
    else if (frac < 0.5) 0
    else if (frac < 0.7) 1
    else if (frac < 0.85) 2
    else if (frac < 0.95) 3
    else 4

  /** The LOWEST degradation level whose projected suite finish fits the
    * budget, from the measured per-sample cost so far: a query at level
    * L costs ≈ (targetIters(L)+1)·perSampleSec (the +1 is the untimed
    * warm-up) + fixedSec (GC settle, teardown). The elapsed-fraction
    * ladder alone reacts too late on a LONG suite (measured: 87 queries
    * at a 240 s budget measured 58 and skipped 29 — degradation must
    * start when the projection first exceeds the budget, not when 50%
    * of it is already spent). Pure — pinned by BenchArtifactSpec. */
  def projectedLevel(elapsedSec: Double, budgetSec: Double, remaining: Int,
      perSampleSec: Double, fixedSec: Double, iters: Int, maxIters: Int): Int =
    if (budgetSec <= 0 || remaining <= 0 || perSampleSec <= 0) 0
    else (0 to 4).find { l =>
      val (tgt, _) = planAtLevel(l, iters, maxIters)
      val warm = if (warmupAtLevel(l)) 1 else 0
      elapsedSec + remaining * ((tgt + warm) * perSampleSec + fixedSec) <= budgetSec
    }.getOrElse(4)

  /** Robust per-sample cost for the projection: a 20%-trimmed mean
    * over all timed samples so far, and 0 (projection off — the
    * elapsed-fraction ladder still guards) until 24 samples exist.
    * The raw mean was the round-10 shedding bug: the suite runs
    * alphabetically, the q_ann_* block sits near the front at 3–10 s
    * per sample while the suite median is ~0.5 s, so six heavy
    * queries (plus one 10 s host-noise outlier) projected the whole
    * run over budget and STICKILY shed 167 of 174 queries to two
    * samples — on a run whose full-precision wall would have been
    * under half the budget. */
  def robustPerSample(costs: Seq[Double]): Double =
    if (costs.size < 24) 0.0
    else {
      val s = costs.sorted
      val keep = s.take(math.max(1, (s.size * 0.8).toInt))
      keep.sum / keep.size
    }

  /** Median over timed samples: the true midpoint — for an EVEN sample
    * count the mean of the two middle samples, not the larger (a
    * budget-degraded 2-sample "median" was silently max-of-2 in round
    * 7, reported 2.4× the min). Pure — pinned by BenchArtifactSpec. */
  def median(sorted: Seq[Double]): Double = {
    val n = sorted.length
    if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }

  def renderJson(
      timings: collection.Map[String, (Double, Double, Double, Int)],
      failed: Seq[String],
      skipped: Seq[String],
      iters: Int,
      sfDir: String,
      budgetExceeded: Boolean,
      complete: Boolean): String = {
    // Locale-pinned: f"%.4f" under a comma-decimal default locale would
    // emit invalid JSON.
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.4f",
      java.lang.Double.valueOf(v))
    val qs = timings.map { case (k, (med, _, _, _)) => "\"" + k + "\":" + fmt(med) }
      .mkString("{", ",", "}")
    val spread = timings.map { case (k, (_, lo, hi, _)) =>
      "\"" + k + "\":[" + fmt(lo) + "," + fmt(hi) + "]"
    }.mkString("{", ",", "}")
    // Per-query timed-sample count: a 2-sample midpoint taken under
    // budget pressure is visible as such instead of posing as a
    // median-of-3 (round-7 verdict #3).
    val ns = timings.map { case (k, (_, _, _, n)) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sk = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = timings.values.map(_._1).sum
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","iters":$iters,"queries":$qs,"spread":$spread,"n_samples":$ns,"failed":$fs,"skipped":$sk,"budget_exceeded":$budgetExceeded,"complete":$complete,"sf":${JsonUtil.quote(sfDir)}}"""
  }

  /** SHORT summary line, printed AFTER the full artifact line: the
    * driver's stdout-tail capture truncated the FRONT of the 123-query
    * line two rounds running ("parsed": null in BENCH_r06/r07) — this
    * line is small enough to survive any tail window and carries the
    * headline metric plus where the full artifact lives. Pure — pinned
    * by BenchArtifactSpec. */
  def renderSummaryJson(
      timings: collection.Map[String, (Double, Double, Double, Int)],
      failed: Seq[String],
      skipped: Seq[String],
      sfDir: String,
      budgetExceeded: Boolean,
      complete: Boolean,
      artifactPath: String): String = {
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.4f",
      java.lang.Double.valueOf(v))
    val total = timings.values.map(_._1).sum
    val slowest = if (timings.isEmpty) ""
      else {
        val (k, (med, _, _, _)) = timings.maxBy(_._2._1)
        "\"" + k + "\":" + fmt(med)
      }
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${timings.size},"n_failed":${failed.size},"n_skipped":${skipped.size},"slowest":{$slowest},"budget_exceeded":$budgetExceeded,"complete":$complete,"sf":${JsonUtil.quote(sfDir)},"artifact":${JsonUtil.quote(artifactPath)}}"""
  }

  def main(args: Array[String]): Unit = {
    val startNanos = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val maxIters = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_ITERS", "7").toInt
      .max(iters)
    // Default sized for median-of-3 on the full suite: the r9 driver run
    // (budget 480) measured a 319 s wall for warm-up + 1 sample × 149
    // queries, so the ladder shed 144/149 queries to a single sample —
    // and the r8→r9 same-code replay showed 1-sample noise reaching
    // 1.9× per query. At 173 queries a single pass costs ~175 s wall,
    // median-of-3 + warm-up ≈ 4× that (~900 s); the 1200 sizing (done
    // at 152 queries) made the cost projection shed most of the suite
    // to 2 samples, so 1800 restores median-of-3 with busy-host
    // headroom while the crash-safe per-query flush still bounds the
    // damage of any external kill.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1800").toDouble
    val settleMs = sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_MS", "150").toLong
    // An ONLY-subset A/B run must never clobber the committed
    // full-suite record (the round-8 review caught exactly that: a
    // 3-query A/B swept into git as the "full" artifact by a later
    // git add -A). Subsets default to their own file.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "BENCH_SUBSET.json"
      else "BENCH_SELF.json")
    def elapsedSec = (System.nanoTime() - startNanos) / 1e9
    def overBudget = budgetSec > 0 && elapsedSec > budgetSec

    // Same unified builder as Verify/user sessions: benched plans are
    // the plans a user session produces (this block previously drifted
    // from the gate — it was missing the UTC session timezone).
    val spark = GraftSession.builder("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session-level warm-up: codegen/JIT/scan paths on the smallest sf so
    // the first query's warm-up run doesn't absorb session startup.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally
        // OUTSIDE the timed interval, and blocking: cache teardown must
        // neither count against the sample nor bleed into the next one
        // (async unpersist would remove blocks concurrently with the
        // following timed run).
        graft.queries.StagedCache.releaseAll(blocking = true)
    }

    // Untimed preheat at the benched sf (see scaladoc): absorb the
    // early-suite compilation storm before any timed interval starts.
    // Runs AFTER session warm-up, BEFORE the suite; counts against the
    // wall-clock budget like everything else (measured ~5 s warm).
    // q_triangle_count joined the list in round 8: its staged
    // degree-oriented edge build was the suite's widest spread
    // ([2.56, 6.04] s in r7) — the wedge-join shapes compile here,
    // position-independently, before any timed interval.
    sys.env.getOrElse("SPARK_GRAFT_BENCH_PREHEAT",
        "q_join_multi,q_window_rank,q1_agg,q_near_dup_minhash,q_asof_join," +
          "q_triangle_count")
      .split(",").map(_.trim).filter(_.nonEmpty)
      .foreach { n =>
        SparkEntry.queries.get(n).foreach { fn =>
          try runOnce(fn)
          catch { case e: Throwable =>
            System.err.println(s"[bench] preheat $n: ${e.getMessage}") }
        }
      }

    val timings = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, Int)]()
    val failed = scala.collection.mutable.ListBuffer[String]()
    val skipped = scala.collection.mutable.ListBuffer[String]()
    var budgetExceeded = false
    def flush(complete: Boolean): String = {
      // The contract is "deadline passed => budget_exceeded", including
    // a deadline that passes during the LAST query's sampling (no
    // later iteration reaches the skip branch to set it).
    if (overBudget) budgetExceeded = true
    val json = renderJson(timings, failed.toSeq, skipped.toSeq, iters, sfDir,
        budgetExceeded, complete)
      // Write-temp-then-move so a kill mid-write can't leave a truncated
      // (unparseable) artifact — the previous complete flush survives.
      try {
        val p = java.nio.file.Paths.get(outPath)
        val tmp = java.nio.file.Paths.get(outPath + ".tmp")
        java.nio.file.Files.write(tmp,
          (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Throwable => System.err.println(s"[bench] write $outPath: ${e.getMessage}") }
      json
    }

    // Optional subset (comma-separated names) for targeted A/B runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val alphabetical = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val suite = sys.env.get("SPARK_GRAFT_BENCH_SEED") match {
      case Some(seed) => new scala.util.Random(seed.toLong).shuffle(alphabetical)
      case None       => alphabetical
    }
    // Per-sample cost tracker for the budget projection (samples
    // include warm-ups — they cost the same wall time). Individual
    // sample costs, not a running mean: the projection trims the top
    // 20% so an early heavy block or one host-noise outlier can't
    // project the whole run over budget ([[robustPerSample]]).
    val costTracker = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Sticky degradation level: precision, once shed, is not re-added
    // mid-suite (a level oscillating with host noise would make
    // early-alphabet queries systematically better-sampled).
    var level = 0
    suite.zipWithIndex.foreach { case ((name, fn), idx) =>
      if (overBudget) { budgetExceeded = true; skipped += name }
      else try {
        // Shed precision before coverage as the budget drains: the
        // elapsed-fraction ladder OR the measured-cost projection,
        // whichever demands more (both pure, BenchArtifactSpec).
        val fracLevel = levelFor(
          if (budgetSec > 0) elapsedSec / budgetSec else 0.0)
        val projLevel = projectedLevel(elapsedSec, budgetSec,
          suite.length - idx,
          robustPerSample(costTracker.toSeq),
          settleMs / 1000.0 + 0.25, iters, maxIters)
        level = math.max(level, math.max(fracLevel, projLevel))
        val (tgtIters, tgtMax) = planAtLevel(level, iters, maxIters)
        val qStart = System.nanoTime()
        var nRuns = 0
        def timedRunOnce(): Double = { nRuns += 1; runOnce(fn) }
        // Warm-up: JIT + codegen compile, discarded — skipped at the
        // deepest level, where it would double the per-query cost.
        if (warmupAtLevel(level)) timedRunOnce()
        val samples = scala.collection.mutable.ArrayBuffer(timedRunOnce())
        // Budget is honored between samples too: a query keeps what it
        // has measured rather than losing the whole suite to one slow
        // straggler (first sample always completes so the query isn't
        // silently half-skipped).
        while (samples.length < tgtIters && !overBudget) samples += timedRunOnce()
        def spreadRatio = {
          val s = samples.sorted
          (s.last - s.head) / median(s.toSeq)
        }
        while (samples.length < tgtMax && spreadRatio > 0.35 && !overBudget)
          samples += timedRunOnce()
        val sorted = samples.sorted.toSeq
        timings(name) = (median(sorted), sorted.head, sorted.last, sorted.length)
        if (nRuns > 0)
          costTracker ++= Seq.fill(nRuns)(
            (System.nanoTime() - qStart) / 1e9 / nRuns)
        // De-shadow: collect this query's garbage now, outside any timed
        // interval, so it isn't collected inside the next query's samples.
        System.gc()
        if (settleMs > 0) Thread.sleep(settleMs)
      } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      // Self-emitted artifact, flushed per query: the driver captures only
      // the tail of sbt output (truncated numbers two rounds running) and
      // round 6's timeout left nothing at all. After every query the file
      // holds a complete, parseable snapshot.
      flush(complete = false)
    }
    val json = flush(complete = true)
    println(json)
    // The tail-window-proof summary, LAST on stdout (see scaladoc).
    println(renderSummaryJson(timings, failed.toSeq, skipped.toSeq, sfDir,
      budgetExceeded, complete = true, artifactPath = outPath))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
