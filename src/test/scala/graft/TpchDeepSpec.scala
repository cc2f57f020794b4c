package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and invariant pins for the second-half TPC-H suite
  * (TpchDeepQueries). Correctness is the driver's DuckDB oracle gate;
  * these tests pin the SHAPES each query exists to exercise, so a
  * planner or query edit that silently re-plans them (e.g. a failed
  * decorrelation falling back to a per-row nested loop) fails here
  * rather than surfacing as a 100×-scale regression.
  */
class TpchDeepSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("every deep TPC-H query returns rows at sf0.001") {
    val names = Seq("q_tpch_q2", "q_tpch_q4", "q_tpch_q9", "q_tpch_q11",
      "q_tpch_q12", "q_tpch_q13", "q_tpch_q16", "q_tpch_q20",
      "q_tpch_q21", "q_tpch_q22")
    val empty = names.filter(n =>
      SparkEntry.queries(n)(spark, sf).limit(1).count() == 0L)
    assert(empty.isEmpty, s"degenerate at sf0.001: $empty")
  }

  test("q2's correlated min-cost subquery decorrelates to keyed joins") {
    // A decorrelation failure re-plans the scalar subquery as a
    // BroadcastNestedLoopJoin (per-outer-row re-evaluation) — the one
    // shape that cannot survive a large part table.
    val plan = formatted("q_tpch_q2")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "min-cost subquery was not decorrelated")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q4's EXISTS plans as ONE semi join with the lateness residual") {
    val plan = formatted("q_tpch_q4")
    assert(plan.contains("LeftSemi"), "EXISTS did not become a semi join")
    assert(plan.contains("date_add"),
      "lateness predicate missing from the semi join condition")
    // One probe of lineitem, not an aggregate-then-join detour. Count
    // scans in the plan TREE (the first formatted block) — the node
    // detail sections repeat each scan header once more below it.
    val scans = plan.split("\n\n")(0).linesIterator
      .count(_.contains("Scan parquet"))
    assert(scans == 2, s"expected orders+lineitem scans only, got $scans")
  }

  test("q13 keeps the LEFT OUTER shape (zero-order customers counted)") {
    val plan = formatted("q_tpch_q13")
    assert(plan.contains("LeftOuter"),
      "join-side priority filter must not degrade the outer join to inner")
    // The zero bucket must actually surface: every customer has some
    // non-5-LOW order is a fixture accident we do NOT rely on, but the
    // histogram total must equal the customer count either way.
    val total = SparkEntry.queries("q_tpch_q13")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("custdist")).head.getLong(0)
    val nCust = graft.sources.Tables.customer(spark, sf).count()
    assert(total == nCust, s"histogram covers $total of $nCust customers")
  }

  test("q16's NOT IN plans as an anti join") {
    val plan = formatted("q_tpch_q16")
    assert(plan.contains("LeftAnti"), "NOT IN did not become an anti join")
  }

  test("q21 plans BOTH existence probes: semi AND anti on the order key") {
    val plan = formatted("q_tpch_q21")
    assert(plan.contains("LeftSemi"), "EXISTS probe missing")
    assert(plan.contains("LeftAnti"), "NOT EXISTS probe missing")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q20's dominant-supplier scalar subquery decorrelates") {
    val plan = formatted("q_tpch_q20")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "per-part total subquery was not decorrelated")
    assert(plan.contains("LeftSemi"), "IN did not become a semi join")
  }

  test("q11 scans lineitem once; the threshold rides a 1-row broadcast") {
    val plan = formatted("q_tpch_q11")
    // Scan identity lives on the detail sections' Location lines.
    val liScans = plan.linesIterator
      .count(l => l.contains("Location") && l.contains("lineitem.parquet"))
    assert(liScans == 1, s"value table re-scanned: $liScans lineitem scans")
  }

  test("q12's buckets partition the joined lines exactly") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_tpch_q12")(spark, sf)
      .agg(sum(col("high_line_count") + col("low_line_count"))).head.getLong(0)
    val li = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
              col("l_shipdate").cast("date") < lit("1998-01-01").cast("date"))
      .count()
    assert(out == li, s"bucketed $out of $li 1997 lines")
  }
}
