package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BloomBuildAgg, BloomMightContain}
import graft.sources.Tables

/** Join-optimization band: the two techniques that decide whether a
  * 100 TB join is a cluster-wide shuffle or a local merge —
  * runtime-filter pre-reduction ([[graft.functions.BloomImpl]]) and
  * storage-co-located (bucketed) joins. Both produce results
  * bit-identical to the plain join (the oracle states the PLAIN join),
  * so what the gate checks is that the optimization is semantically
  * invisible; what PlanAuditSpec/BloomFilterSpec check is that it
  * actually fires (no shuffle exchange / measured row reduction).
  *
  * Reference parallel: every reference job re-shuffles its full input
  * per run (`trace-wordcount-job/src/main/java/org/example/TraceWordCountJob.java:40`
  * — fixed map→shuffle→reduce, no co-location concept); these are the
  * Spark-side levers that make the repeated case cheap.
  */
object JoinOptQueries extends QueryModule {

  /** Bloom parameters for `q_bloom_join`: sized for the urgent-orders
    * key count at sf0.1 ≈ 1,500·10 with fpp 1% — 2 KiB of filter
    * replacing a shuffle of the non-matching ~80% of lineitem. Fixed
    * (not data-derived) so plans and hashes are scale-independent. */
  private val bloomExpectedKeys = 16384L
  private val bloomFpp = 0.01

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Runtime Bloom pre-filter ahead of a fact⋈dim equi-join: the
    // selective side (urgent orders) aggregates its keys into one
    // fixed-size bit array (map-side OR-merge partials), the 1-row
    // aggregate rides a SCALAR SUBQUERY — executed once, substituted
    // as a literal into the fact-side filter (NOT cross-joined: a
    // 1-row crossJoin concatenates the filter's bytes into every fact
    // row — measured 2.5 s vs 0.6 s at sf0.1) — and the fact scan
    // drops non-candidates BEFORE the join shuffle, so shuffle volume
    // becomes ∝ match rate, not corpus size. False positives survive
    // the pre-filter and are removed by the join itself, so the
    // result (and the oracle) is exactly the plain join.
    "q_bloom_join" -> ((s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val bloom = org.apache.spark.sql.graftbridge.Bridge.scalarSubquery(
        dim.agg(
          BloomBuildAgg(col("o_orderkey"), bloomExpectedKeys, bloomFpp).as("bf")))
      val fact = Tables.lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice")
      val pre = fact.where(BloomMightContain(bloom, col("l_orderkey")))
      pre.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // Storage-co-located join: both sides written bucketed (and
    // per-bucket sorted) on the join key, so the sort-merge join reads
    // matching buckets directly — ZERO shuffle exchange on either side
    // (PlanAuditSpec pins the executed plan). At 100 TB this is the
    // bucketing amortization: one bucketed write, then every
    // downstream join/aggregation on that key is exchange-free. The
    // `merge` hint keeps the demonstration honest (a broadcast of the
    // smaller side would also avoid the shuffle, but only below the
    // driver-memory threshold that a real dimension outgrows).
    "q_join_bucketed" -> ((s, d) => {
      val app = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      val sfn = new java.io.File(d).getName.replaceAll("[^a-zA-Z0-9]", "_")
      val base = s"${sys.props("java.io.tmpdir")}/graft_buckets_${app}_$sfn"
      val ordersTable = s"graft_orders_b_${app}_$sfn"
      val lineitemTable = s"graft_lineitem_b_${app}_$sfn"
      Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").option("path", s"$base/orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordersTable)
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").option("path", s"$base/lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lineitemTable)
      s.table(ordersTable).hint("merge")
        .join(s.table(lineitemTable), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*) AS cnt,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderpriority = '1-URGENT'
        | GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),
    "q_join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | round(sum(l_quantity), 2) AS sum_qty
        | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        | GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", "")
  )
}
