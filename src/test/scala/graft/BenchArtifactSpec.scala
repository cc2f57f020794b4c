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
      "q1_agg" -> (0.5, 0.4, 0.9),
      "q_sort" -> (1.25, 1.0, 1.5))
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
    val acc = collection.mutable.LinkedHashMap[String, (Double, Double, Double)]()
    names.zipWithIndex.foreach { case (n, i) =>
      acc(n) = (0.1 * (i + 1), 0.05, 0.2 * (i + 1))
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
      collection.mutable.LinkedHashMap("q_x" -> (0.0001, 0.0001, 0.0001)),
      Nil, Nil, iters = 1, sfDir = "/root/testdata/sf0.01",
      budgetExceeded = false, complete = true))
    assert((j \ "sf") == JString("/root/testdata/sf0.01"))
    assert((j \ "complete") == JBool(true))
  }
}
