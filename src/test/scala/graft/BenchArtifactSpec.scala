package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Pins the crash-safety contract of the bench artifact: the JSON line
  * `Bench.renderJson` emits must parse at EVERY prefix of the suite —
  * empty, partial (budget-exceeded, with skips and failures), and
  * complete — because the file is rewritten after each query precisely
  * so an external kill leaves a machine-readable snapshot (round 6's
  * driver bench died rc 124 with nothing parseable).
  */
class BenchArtifactSpec extends AnyFunSuite {

  private def parse(s: String): JValue = JsonMethods.parse(s)

  test("empty artifact (kill before first query) parses with zero queries") {
    val j = parse(Bench.renderJson(
      collection.mutable.LinkedHashMap.empty, Nil, Nil,
      iters = 3, sfDir = "/root/testdata/sf0.1",
      budgetExceeded = false, complete = false))
    assert((j \ "queries") == JObject(Nil))
    assert((j \ "complete") == JBool(false))
    assert((j \ "value") == JDouble(0.0))
  }

  test("partial artifact carries completed medians, spread, skips, failures, flags") {
    val timings = collection.mutable.LinkedHashMap(
      "q1_agg" -> (0.5, 0.4, 0.9, 3),
      "q_sort" -> (1.25, 1.0, 1.5, 2))
    val j = parse(Bench.renderJson(timings, Seq("q_bad"), Seq("q_late1", "q_late2"),
      iters = 3, sfDir = "/tmp/sf", budgetExceeded = true, complete = false))
    assert((j \ "queries" \ "q1_agg") == JDouble(0.5))
    assert((j \ "queries" \ "q_sort") == JDouble(1.25))
    assert((j \ "spread" \ "q_sort") == JArray(List(JDouble(1.0), JDouble(1.5))))
    assert((j \ "failed") == JArray(List(JString("q_bad"))))
    assert((j \ "skipped") == JArray(List(JString("q_late1"), JString("q_late2"))))
    assert((j \ "budget_exceeded") == JBool(true))
    assert((j \ "value") == JDouble(1.75))
  }

  test("every prefix of a growing suite parses and totals its own medians") {
    val names = (1 to 30).map(i => f"q_p$i%02d")
    val acc = collection.mutable.LinkedHashMap[String, (Double, Double, Double, Int)]()
    names.zipWithIndex.foreach { case (n, i) =>
      acc(n) = (0.1 * (i + 1), 0.05, 0.2 * (i + 1), 3)
      val j = parse(Bench.renderJson(acc, Nil, names.drop(i + 1),
        iters = 3, sfDir = "x", budgetExceeded = false, complete = false))
      val JObject(fields) = (j \ "queries"): @unchecked
      assert(fields.length == i + 1)
      val JDouble(total) = (j \ "value"): @unchecked
      assert(math.abs(total - acc.values.map(_._1).sum) < 1e-3)
    }
  }

  test("query names are JSON-escaped-safe (plain identifiers) and sf path round-trips") {
    val j = parse(Bench.renderJson(
      collection.mutable.LinkedHashMap("q_x" -> (0.0001, 0.0001, 0.0001, 1)),
      Nil, Nil, iters = 1, sfDir = "/root/testdata/sf0.01",
      budgetExceeded = false, complete = true))
    assert((j \ "sf") == JString("/root/testdata/sf0.01"))
    assert((j \ "complete") == JBool(true))
  }

  test("budget ladder sheds precision before coverage, monotonically") {
    // No budget → full sampling.
    assert(Bench.samplingPlan(0.0, 3, 7) == ((3, 7)))
    assert(Bench.samplingPlan(-1.0, 5, 9) == ((5, 9)))
    // Fresh run → full sampling; then adaptive extras go first, then
    // iters step down, and at heavy pressure every query still gets
    // exactly one timed sample (coverage is never shed).
    assert(Bench.samplingPlan(0.2, 3, 7) == ((3, 7)))
    assert(Bench.samplingPlan(0.6, 3, 7) == ((3, 3)))
    assert(Bench.samplingPlan(0.75, 3, 7) == ((2, 2)))
    assert(Bench.samplingPlan(0.9, 3, 7) == ((1, 1)))
    assert(Bench.samplingPlan(1.5, 3, 7) == ((1, 1)))
    // Monotone non-increasing in pressure, and target ≤ max throughout.
    val fracs = (0 to 24).map(_ * 0.05)
    val plans = fracs.map(f => Bench.samplingPlan(f, 3, 7))
    plans.sliding(2).foreach { case Seq((a1, m1), (a2, m2)) =>
      assert(a2 <= a1 && m2 <= m1)
    }
    plans.foreach { case (t, m) => assert(t >= 1 && m >= t) }
  }

  test("robust per-sample cost: projection-off until 24 samples, then " +
       "a 20%-trimmed mean an early heavy block cannot poison") {
    // Too little evidence → 0 (projection disabled, ladder still guards).
    assert(Bench.robustPerSample(Seq.fill(23)(5.0)) == 0.0)
    // The round-10 shedding shape: 10 heavy early samples (3–10 s)
    // atop a 0.5 s-median suite. The raw mean (~1.6 s) projected a
    // 174-query run over an 1800 s budget; the trimmed mean stays near
    // the body of the distribution.
    val costs = Seq.fill(10)(6.0) ++ Seq.fill(40)(0.5)
    val robust = Bench.robustPerSample(costs)
    assert(robust < 1.0, s"trimmed mean still outlier-dominated: $robust")
    assert(robust >= 0.5, s"trimmed mean below the body: $robust")
    // All-uniform costs pass through ~unchanged.
    assert(math.abs(Bench.robustPerSample(Seq.fill(30)(0.7)) - 0.7) < 1e-9)
  }

  test("cost projection picks the cheapest level that fits the whole suite") {
    // No budget / no data → no degradation.
    assert(Bench.projectedLevel(10, 0, 50, 0.5, 0.4, 3, 7) == 0)
    assert(Bench.projectedLevel(10, 600, 50, 0.0, 0.4, 3, 7) == 0)
    // Roomy budget: full sampling fits. 50 queries × (4×0.5+0.4)=120s.
    assert(Bench.projectedLevel(10, 600, 50, 0.5, 0.4, 3, 7) == 0)
    // Tight budget: two samples still fit (45+87×(3×0.6+0.4)=236 ≤ 240)
    // but base-iters don't (45+87×2.8=289) — cheapest fitting level.
    assert(Bench.projectedLevel(45, 240, 87, 0.6, 0.4, 3, 7) == 2)
    // Tighter: only one sample fits (30+87×(2×0.6+0.4)=169 ≤ 180).
    assert(Bench.projectedLevel(30, 180, 87, 0.6, 0.4, 3, 7) == 3)
    // Mid budget: two samples fit but three don't.
    // L1: 40×(4×1.0+0.4)=176 > 150-10; L2: 40×(3×1.0+0.4)=136 ≤ 140.
    assert(Bench.projectedLevel(10, 150, 40, 1.0, 0.4, 3, 7) == 2)
    // Nothing fits → deepest level (no warm-up; coverage still
    // attempted, the between-samples budget check handles the rest).
    assert(Bench.projectedLevel(230, 240, 87, 0.6, 0.4, 3, 7) == 4)
    // Warm-up is shed only at the deepest level: level 4 fits where
    // level 3's extra warm-up run does not.
    // L3: 100+50×(2×1.0+0.4)=220 > 210; L4: 100+50×(1×1.0+0.4)=170 ≤ 210.
    assert(Bench.projectedLevel(100, 210, 50, 1.0, 0.4, 3, 7) == 4)
    assert(!Bench.warmupAtLevel(4))
    (0 to 3).foreach(l => assert(Bench.warmupAtLevel(l)))
    // Monotone: tighter budget or more remaining never lowers the level.
    for (b <- Seq(100.0, 200.0, 400.0, 800.0).sliding(2)) {
      val Seq(tight, roomy) = b
      assert(Bench.projectedLevel(0, tight, 60, 0.5, 0.4, 3, 7) >=
        Bench.projectedLevel(0, roomy, 60, 0.5, 0.4, 3, 7))
    }
  }

  test("median is the true midpoint, not max-of-2 under budget degradation") {
    assert(Bench.median(Seq(1.0)) == 1.0)
    // Round 7's q_triangle_count shape: 2 samples [2.56, 6.04] reported
    // 6.04 (the larger) as its "median"; the midpoint is the honest read.
    assert(Bench.median(Seq(2.56, 6.04)) == (2.56 + 6.04) / 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 9.0)) == 2.0)
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 10.0)) == 2.5)
  }

  test("artifact records per-query timed-sample counts") {
    val timings = collection.mutable.LinkedHashMap(
      "q_full" -> (0.5, 0.4, 0.9, 3),
      "q_degraded" -> (4.3, 2.56, 6.04, 2))
    val j = parse(Bench.renderJson(timings, Nil, Nil, iters = 3, sfDir = "x",
      budgetExceeded = true, complete = true))
    assert((j \ "n_samples" \ "q_full") == JInt(3))
    assert((j \ "n_samples" \ "q_degraded") == JInt(2))
  }

  test("summary line parses, stays tail-window small, and names the slowest query") {
    val timings = collection.mutable.LinkedHashMap(
      (1 to 150).map(i => (f"q_p$i%03d", (0.1 * i, 0.05, 0.2 * i, 3))): _*)
    val s = Bench.renderSummaryJson(timings, Seq("q_bad"), Seq("q_late"),
      "/root/testdata/sf0.1", budgetExceeded = false, complete = true,
      artifactPath = "BENCH_SELF.json")
    val j = parse(s)
    assert((j \ "n_queries") == JInt(150))
    assert((j \ "n_failed") == JInt(1))
    assert((j \ "n_skipped") == JInt(1))
    assert((j \ "artifact") == JString("BENCH_SELF.json"))
    assert((j \ "slowest" \ "q_p150") != JNothing)
    val JDouble(total) = (j \ "value"): @unchecked
    assert(math.abs(total - timings.values.map(_._1).sum) < 1e-3)
    // The whole point: independent of suite size, the line fits any
    // plausible tail-capture window.
    assert(s.length < 400, s"summary line too long (${s.length}): $s")
    // Empty suite (kill before first query) still renders and parses.
    val e = parse(Bench.renderSummaryJson(
      collection.mutable.LinkedHashMap.empty, Nil, Nil, "x",
      budgetExceeded = false, complete = false, artifactPath = "o.json"))
    assert((e \ "n_queries") == JInt(0))
  }
}
