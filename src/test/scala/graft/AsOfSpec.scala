package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** Unit tests for the custom as-of join operator (logical node +
  * strategy + physical merge), including cross-partition correctness —
  * the required distribution must co-partition both sides by key. */
class AsOfSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def frames() = {
    val s = spark
    import s.implicits._
    val quotes = Seq( // (qid, sym, qts, px)
      (1L, "A", ts("2026-01-01 10:00:00"), 10.0),
      (2L, "A", ts("2026-01-01 10:05:00"), 11.0),
      (3L, "B", ts("2026-01-01 10:02:00"), 20.0),
      (4L, "C", ts("2026-01-01 10:30:00"), 30.0)
    ).toDF("qid", "q_sym", "q_ts", "px")
    val trades = Seq( // (tid, sym, tts)
      (100L, "A", ts("2026-01-01 10:04:59")), // matches quote 1
      (101L, "A", ts("2026-01-01 10:05:00")), // equal ts → quote 2 (inclusive)
      (102L, "A", ts("2026-01-01 11:00:00")), // latest → quote 2
      (103L, "B", ts("2026-01-01 10:00:00")), // before any B quote → null
      (104L, "D", ts("2026-01-01 10:00:00")) // no quotes for D → null
    ).toDF("tid", "t_sym", "t_ts")
    (trades, quotes)
  }

  private def run(trades: org.apache.spark.sql.DataFrame,
                  quotes: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    AsOf.join(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts")
      .select("tid", "qid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  private val expected = Map(
    100L -> Some(1L), 101L -> Some(2L), 102L -> Some(2L),
    103L -> None, 104L -> None)

  test("as-of join picks the greatest right ts <= left ts, inclusive, per key") {
    val (trades, quotes) = frames()
    assert(run(trades, quotes) == expected)
  }

  test("as-of join is correct across arbitrary input partitioning") {
    val (trades, quotes) = frames()
    assert(run(trades.repartition(5), quotes.repartition(3)) == expected)
    assert(run(trades.repartition(1), quotes.repartition(7)) == expected)
  }

  test("as-of join output survives a shuffle placed directly above it") {
    // Regression: the exec must emit UnsafeRow — a ShuffleExchangeExec
    // right above the join (no Project in between) casts rows to
    // UnsafeRow, which threw ClassCastException on raw JoinedRow output.
    val (trades, quotes) = frames()
    val shuffled = AsOf.join(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts")
      .repartition(4)
    val got = shuffled.collect()
      .map(r => r.getLong(r.fieldIndex("tid")) ->
        (if (r.isNullAt(r.fieldIndex("qid"))) None
         else Some(r.getLong(r.fieldIndex("qid"))))).toMap
    assert(got == expected)
    // Sort directly above exercises the same row-format requirement.
    val sorted = AsOf.join(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts")
      .orderBy("qid")
    assert(sorted.count() == 5L)
  }

  private def runForward(trades: org.apache.spark.sql.DataFrame,
                         quotes: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    AsOf.join(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts", forward = true)
      .select("tid", "qid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  private val expectedForward = Map(
    100L -> Some(2L), // next A quote at 10:05:00
    101L -> Some(2L), // equal ts → inclusive
    102L -> None,     // no A quote after 11:00
    103L -> Some(3L), // B quote at 10:02 is ahead of 10:00
    104L -> None)     // no quotes for D

  test("forward as-of join picks the smallest right ts >= left ts, inclusive, per key") {
    val (trades, quotes) = frames()
    assert(runForward(trades, quotes) == expectedForward)
  }

  test("forward as-of join is correct across arbitrary input partitioning") {
    val (trades, quotes) = frames()
    assert(runForward(trades.repartition(5), quotes.repartition(3)) == expectedForward)
    assert(runForward(trades.repartition(1), quotes.repartition(7)) == expectedForward)
  }

  test("as-of join rejects overlapping column names") {
    val (trades, quotes) = frames()
    intercept[IllegalArgumentException] {
      AsOf.join(trades, trades, "t_sym", "t_sym", "t_ts", "t_ts")
    }
  }

  test("physical plan contains the custom exec with co-partitioned children") {
    val (trades, quotes) = frames()
    val plan = AsOf.join(trades, quotes, "t_sym", "q_sym", "t_ts", "q_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Sort") && plan.contains("Exchange hashpartitioning"))
  }
}
