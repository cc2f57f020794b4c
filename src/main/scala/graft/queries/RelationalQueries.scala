package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational operator inventory over the TPC-H-ish star schema:
  * aggregation, filter pushdown, all join shapes, windows, top-k,
  * set ops, rollup/cube/grouping-sets, pivot, subqueries.
  *
  * Scale design notes (verified via `.explain("formatted")`):
  *   - dim joins (region/nation/supplier/customer) are explicitly
  *     `broadcast()` — at 100 TB the fact side never shuffles for them;
  *   - fact-fact joins (lineitem ⋈ orders) shuffle on the join key once,
  *     and AQE handles skew/coalescing;
  *   - aggregates ride partial → final HashAggregate (map-side combine);
  *   - filters/projections sit directly over the scan so Parquet gets
  *     `PushedFilters` + pruned `ReadSchema`;
  *   - top-k is `orderBy(...).limit(k)` → `TakeOrderedAndProject` (no
  *     global sort materialization).
  *
  * Determinism contract: every query ends in a total ORDER BY (unique
  * tiebreaker) and floating aggregates are rounded, so the DuckDB hash
  * compare is stable.
  */
object RelationalQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation -----------------------------------------------------
    // TPC-H Q1 shape: scan-heavy group-agg with arithmetic; partial agg
    // shuffles |groups| rows per partition, not |input|.
    "q1_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q6 shape: highly selective predicates — all three reach the
    // Parquet scan as PushedFilters.
    "q6_filter_pushdown" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) &&
          col("l_quantity") < 25)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))),

    "q_distinct_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    "q_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "q_having" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 40)
        .orderBy("l_partkey")),

    // ---- joins -----------------------------------------------------------
    // Small dim side broadcast: zero shuffle of the 15k/“100 TB” fact side.
    "q_join_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q5 shape: one fact-fact shuffle join (lineitem ⋈ orders),
    // everything else broadcast.
    "q_join_multi" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n  = Tables.nation(s, d)
      val r  = Tables.region(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su),
          li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r),
          n("n_regionkey") === r("r_regionkey") && r("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("n_name")
    }),

    "q_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_outer_join_count" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    }),

    // ---- windows ---------------------------------------------------------
    // Distribution window functions (ntile / percent_rank / cume_dist)
    // over a TOTAL order (price, then the unique orderkey tiebreak):
    // ntile assigns by row position, so an ordering with ties would be
    // partitioning-dependent; the unique suffix makes all three
    // deterministic on any engine. percent_rank's (r-1)/(n-1) and
    // cume_dist's r/n are single divisions of identical integers on
    // both engines — rounded to 6dp anyway, the float-parity rule.
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") <= 3000)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("prev_price", round(coalesce(lag("o_totalprice", 1).over(w), lit(0.0)), 2))
        .select("o_custkey", "o_orderkey", "prev_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Window frames + distribution functions: a 30-day RANGE frame
    // (value-based, not row-based — late/sparse orders widen or narrow
    // the frame correctly) plus ntile/percent_rank. Range frames need a
    // numeric order key: days since epoch.
    "q_window_frames" -> ((s, d) => {
      val withDay = Tables.orders(s, d)
        .withColumn("day_no", datediff(col("o_orderdate"), lit("1990-01-01").cast("date")))
      val wRange = Window.partitionBy("o_custkey").orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
      val wRank = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      withDay.select(col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice")).over(wRange), 2).as("sum_30d"),
          ntile(4).over(wRank).cast("long").as("price_quartile"),
          round(percent_rank().over(wRank), 6).as("pct_rank"))
        .orderBy("o_orderkey")
    }),

    // ---- sorts / top-k ---------------------------------------------------
    // orderBy(...).limit(k) plans as TakeOrderedAndProject: per-partition
    // heap + driver merge of k rows — no global sort at any scale.
    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // ---- set operations --------------------------------------------------
    "q_union" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")),

    "q_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("ck"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("ck")))
        .orderBy("ck")),

    "q_except" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("ck")).distinct()
        .except(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("ck")))
        .orderBy("ck")),

    // ---- grouping sets / rollup / cube / pivot ---------------------------
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
              | FROM lineitem
              | GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              | ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin)
    }),

    "q_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .orderBy("l_returnflag")),

    // Unpivot/melt: four metric columns to (metric, val) rows. Map-only
    // (Expand, no shuffle). The four-column id prefix is a verified
    // unique key of the synthetic lineitem, so the presentation order
    // is total and values are copied verbatim — no float arithmetic.
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 300)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "metric")),

    // ---- subqueries ------------------------------------------------------
    // Scalar subquery as a broadcast of a 1-row aggregate.
    "q_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val avgP = o.agg(avg("o_totalprice").as("_avg"))
      o.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("_avg"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q_corr_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""SELECT o_custkey, o_orderkey, o_totalprice
              | FROM orders o
              | WHERE o_totalprice = (SELECT max(o2.o_totalprice)
              |                       FROM orders o2
              |                       WHERE o2.o_custkey = o.o_custkey)
              | ORDER BY o_custkey, o_orderkey""".stripMargin)
    }),

    // TPC-H Q3 (shipping priority): the classic dim-filter + fact-fact
    // join + group-agg + top-k composition. Revenue is exact integers
    // end-to-end — price in cents × (100 − discount%) — because a
    // double Σ(price·(1−disc)) is partition-order-dependent. Plan:
    // BUILDING customers broadcast, lineitem ⋈ orders shuffles once on
    // the order key, top-10 is a distributed TakeOrderedAndProject.
    "q_tpch_q3" -> ((s, d) => {
      val cutoff = lit("1998-06-01").cast("date")
      val c = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"), col("o_orderpriority"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") > cutoff)
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_date", "o_orderpriority")
        .agg(sum("rev_u").as("revenue_u"))
        .orderBy(col("revenue_u").desc, col("l_orderkey")).limit(10)
    }),

    // TPC-H Q5 (local-supplier volume) as SQL TEXT — the parser/
    // analyzer path under the same oracle gate as the DataFrame
    // queries: six tables, the region→nation chain broadcast-pruned,
    // the supplier-nation = customer-nation correlation as an extra
    // join predicate, integer-exact revenue.
    "q_tpch_q5" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(t => Tables(s, d, t).createOrReplaceTempView(s"tq5_$t"))
      s.sql("""SELECT n_name,
              |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
              |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              |    AS revenue_u
              | FROM tq5_customer c
              | JOIN tq5_orders o ON o.o_custkey = c.c_custkey
              | JOIN tq5_lineitem l ON l.l_orderkey = o.o_orderkey
              | JOIN tq5_supplier s2 ON s2.s_suppkey = l.l_suppkey
              |   AND s2.s_nationkey = c.c_nationkey
              | JOIN tq5_nation n ON n.n_nationkey = s2.s_nationkey
              | JOIN tq5_region r ON r.r_regionkey = n.n_regionkey
              | WHERE r_name = 'ASIA'
              |   AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
              |   AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
              | GROUP BY n_name
              | ORDER BY revenue_u DESC, n_name""".stripMargin)
    }),

    // TPC-H Q7 (volume shipping): revenue between a nation PAIR in both
    // directions, grouped by (supp_nation, cust_nation, ship year). The
    // symmetric OR pair predicate cannot prune either nation join alone,
    // so both nation lookups broadcast onto their fact side and the pair
    // filter runs post-join — the planner-correct shape (a disjunctive
    // predicate over two dims never becomes a scan filter). One fact-fact
    // shuffle (lineitem ⋈ orders); supplier/customer/nation broadcast.
    "q_tpch_q7" -> ((s, d) => {
      val nA = "NATION_1"; val nB = "NATION_2"
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val su = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .filter(col("supp_nation").isin(nA, nB))
        .select("s_suppkey", "supp_nation")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("cust_nation").isin(nA, nB))
        .select("c_custkey", "cust_nation")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("l_shipdate").cast("date") <= lit("1997-12-31").cast("date"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
      l.join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === nA && col("cust_nation") === nB) ||
                (col("supp_nation") === nB && col("cust_nation") === nA))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("rev_u").as("revenue_u"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 (national market share): the target nation's share of
    // AMERICA's ECONOMY-part import revenue per order year. The share is
    // a conditional-sum ratio — kept integer-exact as basis points via
    // BIGINT floor division (numerator ≤ Σrev_u·10⁴ < 2⁶³), the
    // cross-engine float-parity rule. Part is the selective filter and
    // prunes lineitem through the join; all dims broadcast.
    "q_tpch_q8" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val americaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val c = Tables.customer(s, d)
        .join(broadcast(americaNations), col("c_nationkey") === col("c_nk"))
        .select("c_custkey")
      val suppNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >= lit("1996-01-01").cast("date") &&
                col("o_orderdate").cast("date") <= lit("1997-12-31").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_5", col("rev_u"))
            .otherwise(lit(0L))).as("nation_u"),
          sum("rev_u").as("total_u"))
        .select(col("o_year"),
          expr("nation_u * 10000L DIV total_u").as("share_bp"),
          col("total_u"))
        .orderBy("o_year")
    }),

    // TPC-H Q10 (returned-item reporting): customers who returned goods
    // in a half-year window, ranked by lost revenue. Group-by carries the
    // full customer tuple (grouping by the c_custkey key makes the rest
    // functionally dependent); acctbal travels as exact cents. Top-20 is
    // TakeOrderedAndProject over the post-agg rows.
    "q_tpch_q10" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >= lit("1997-01-01").cast("date") &&
                col("o_orderdate").cast("date") < lit("1997-07-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
      val c = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"),
          col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name", "acctbal_cents", "n_name")
        .agg(sum("rev_u").as("revenue_u"))
        .orderBy(col("revenue_u").desc, col("c_custkey")).limit(20)
    }),

    // TPC-H Q14 (promo effect): PROMO parts' share of monthly revenue
    // over 1997. Same conditional-sum basis-point discipline as Q8; the
    // part flag rides a broadcast join, so the only shuffle is the
    // 12-group month aggregation.
    "q_tpch_q14" -> ((s, d) => {
      val promo = Tables.part(s, d)
        .select(col("p_partkey"),
          (col("p_type") === "PROMO").cast("long").as("is_promo"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
                col("l_shipdate").cast("date") < lit("1998-01-01").cast("date"))
        .select(col("l_partkey"),
          month(col("l_shipdate")).cast("long").as("ship_month"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .groupBy("ship_month")
        .agg(
          sum(when(col("is_promo") === 1L, col("rev_u")).otherwise(lit(0L)))
            .as("promo_u"),
          sum("rev_u").as("total_u"))
        .select(col("ship_month"),
          expr("promo_u * 10000L DIV total_u").as("promo_share_bp"),
          col("total_u"))
        .orderBy("ship_month")
    }),

    // TPC-H Q18 (large-volume customers): orders whose total quantity
    // exceeds a threshold, with the customer attached. The HAVING
    // subquery is a self-aggregation of lineitem semi-joined back — one
    // hash-partitioned exchange on l_orderkey feeds BOTH the filter agg
    // and the final per-order sum (exchange reuse), and quantities are
    // integral by fixture contract so the sum is an exact BIGINT.
    "q_tpch_q18" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), round(col("l_quantity")).cast("long").as("qty"))
      val big = l.groupBy("l_orderkey").agg(sum("qty").as("sum_qty"))
        .filter(col("sum_qty") > 180L)
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_date"),
          round(col("o_totalprice") * 100).cast("long").as("totalprice_cents"))
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_date",
          "totalprice_cents", "sum_qty")
        .orderBy(col("totalprice_cents").desc, col("o_orderkey")).limit(50)
    }),

    // TPC-H Q15 (top supplier): the revenue-view + global-max-match
    // shape — every supplier whose quarterly revenue equals the
    // maximum (ties kept, per the spec). The view is staged once and
    // consumed twice (the match leg and the 1-row max); the max rides
    // a broadcast crossJoin, so no second pass over lineitem and no
    // window over the supplier domain.
    "q_tpch_q15" -> ((s, d) => {
      val rev = StagedCache.persist(Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
                col("l_shipdate").cast("date") < lit("1997-04-01").cast("date"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(
          round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("total_revenue_u")))
      val mx = rev.agg(max("total_revenue_u").as("mx"))
      rev
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
          col("supplier_no") === col("s_suppkey"))
        .crossJoin(broadcast(mx))
        .filter(col("total_revenue_u") === col("mx"))
        .select("s_suppkey", "s_name", "total_revenue_u")
        .orderBy("s_suppkey")
    }),

    // TPC-H Q17 (small-quantity-order revenue) as SQL TEXT: the
    // correlated SCALAR AGGREGATE subquery over another relation —
    // the shape Catalyst must decorrelate into a per-partkey average
    // join (check: no BNLJ below). The threshold compare stays on
    // doubles deliberately: 0.2 · avg is the same IEEE literal ·
    // division · multiply on both engines, and the output is exact
    // integer cents + a row count, so the hash cannot float-drift.
    // PRECONDITION, pinned by TablesSpec ("l_quantity is integral"):
    // the avg is order-independent only because quantities are
    // integral doubles (exact partial sums in any fold order).
    "q_tpch_q17" -> ((s, d) => {
      Seq("lineitem", "part")
        .foreach(t => Tables(s, d, t).createOrReplaceTempView(s"tq17_$t"))
      s.sql("""SELECT count(*) AS n_rows,
              |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS total_cents
              | FROM tq17_lineitem l JOIN tq17_part p
              |   ON p.p_partkey = l.l_partkey
              | WHERE p.p_brand = 'Brand#4'
              |   AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
              |                       FROM tq17_lineitem l2
              |                       WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
    }),

    // TPC-H Q19 (discounted revenue): the disjunctive OR-of-ANDs
    // predicate spanning BOTH join sides — the shape that cannot split
    // into per-table scan filters, so the planner must evaluate it as
    // a post-join residual while still pushing the per-branch part
    // filters' UNION as an implied part-side prune. Grouped by brand
    // tier so the oracle checks each disjunct's contribution.
    "q_tpch_q19" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40)))
        .groupBy("p_brand")
        .agg(sum("rev_u").as("revenue_u"), count(lit(1)).as("n_rows"))
        .orderBy("p_brand")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  o_orderpriority,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
        |    AS revenue_u
        | FROM customer, orders, lineitem
        | WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |   AND l_orderkey = o_orderkey
        |   AND CAST(o_orderdate AS DATE) < DATE '1998-06-01'
        |   AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
        | GROUP BY 1, 2, 3
        | ORDER BY revenue_u DESC, l_orderkey LIMIT 10"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q5" ->
      """SELECT n_name,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
        |    AS revenue_u
        | FROM customer c
        | JOIN orders o ON o.o_custkey = c.c_custkey
        | JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        | JOIN supplier s2 ON s2.s_suppkey = l.l_suppkey
        |   AND s2.s_nationkey = c.c_nationkey
        | JOIN nation n ON n.n_nationkey = s2.s_nationkey
        | JOIN region r ON r.r_regionkey = n.n_regionkey
        | WHERE r_name = 'ASIA'
        |   AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |   AND CAST(o_orderdate AS DATE) < DATE '1999-01-01'
        | GROUP BY n_name
        | ORDER BY revenue_u DESC, n_name""".stripMargin.replace("\n", ""),

    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(CAST(l_shipdate AS DATE))::BIGINT AS l_year,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
        |    AS revenue_u
        | FROM supplier s, lineitem l, orders o, customer c,
        |      nation n1, nation n2
        | WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |   AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |   AND c_nationkey = n2.n_nationkey
        |   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |   AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
        |     AND DATE '1997-12-31'
        | GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin.replace("\n", ""),

    "q_tpch_q8" ->
      """WITH base AS (SELECT year(CAST(o_orderdate AS DATE))::BIGINT AS o_year,
        |   CAST(round(l_extendedprice * 100) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u,
        |   n2.n_name AS supp_nation
        |  FROM part p, supplier s, lineitem l, orders o, customer c,
        |       nation n1, nation n2, region r
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        |    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
        |      AND DATE '1997-12-31'
        |    AND p_type = 'ECONOMY')
        |SELECT o_year,
        |  ((sum(CASE WHEN supp_nation = 'NATION_5' THEN rev_u ELSE 0 END)
        |    * 10000) // sum(rev_u))::BIGINT AS share_bp,
        |  sum(rev_u)::BIGINT AS total_u
        | FROM base GROUP BY o_year ORDER BY o_year"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, n_name,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
        |    AS revenue_u
        | FROM customer, orders, lineitem, nation
        | WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |   AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |   AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
        |   AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        | GROUP BY 1, 2, 3, 4
        | ORDER BY revenue_u DESC, c_custkey LIMIT 20"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q14" ->
      """WITH base AS (SELECT month(CAST(l_shipdate AS DATE))::BIGINT
        |    AS ship_month,
        |   CAST(round(l_extendedprice * 100) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u,
        |   CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01')
        |SELECT ship_month,
        |  ((sum(CASE WHEN is_promo = 1 THEN rev_u ELSE 0 END) * 10000)
        |    // sum(rev_u))::BIGINT AS promo_share_bp,
        |  sum(rev_u)::BIGINT AS total_u
        | FROM base GROUP BY ship_month ORDER BY ship_month"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |  sum_qty
        | FROM (SELECT l_orderkey,
        |         sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty
        |        FROM lineitem GROUP BY 1 HAVING sum_qty > 180) big
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN customer ON c_custkey = o_custkey
        | ORDER BY totalprice_cents DESC, o_orderkey LIMIT 50"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey AS supplier_no,
        |   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |     * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
        |     AS total_revenue_u
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_u
        | FROM rev JOIN supplier ON s_suppkey = supplier_no
        | WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM rev)
        | ORDER BY s_suppkey""".stripMargin.replace("\n", ""),

    "q_tpch_q17" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |    AS total_cents
        | FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        | WHERE p.p_brand = 'Brand#4'
        |   AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                       FROM lineitem l2
        |                       WHERE l2.l_partkey = p.p_partkey)"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q19" ->
      """SELECT p_brand,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT
        |    AS revenue_u,
        |  count(*)::BIGINT AS n_rows
        | FROM lineitem JOIN part ON p_partkey = l_partkey
        | WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 1 AND 20)
        |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |         AND l_quantity BETWEEN 10 AND 30)
        |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |         AND l_quantity BETWEEN 20 AND 40)
        | GROUP BY p_brand ORDER BY p_brand""".stripMargin.replace("\n", ""),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30'
        | GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", ""),
    "q6_filter_pushdown" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |   AND l_discount BETWEEN 0.02 AND 0.06
        |   AND l_quantity < 25""".stripMargin.replace("\n", ""),
    "q_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),
    "q_agg_stats" ->
      """SELECT l_returnflag, min(l_extendedprice) AS min_price,
        | max(l_extendedprice) AS max_price,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(stddev_samp(l_extendedprice), 4) AS sd_price,
        | count(*) AS n
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),
    "q_having" ->
      """SELECT l_partkey, count(*) AS cnt FROM lineitem
        | GROUP BY l_partkey HAVING count(*) >= 40 ORDER BY l_partkey"""
        .stripMargin.replace("\n", ""),
    "q_join_broadcast" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment ORDER BY c_mktsegment"""
        .stripMargin.replace("\n", ""),
    "q_join_multi" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        | FROM lineitem
        | JOIN orders   ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation   ON s_nationkey = n_nationkey
        | JOIN region   ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        | GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", ""),
    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | ORDER BY c_custkey""".stripMargin.replace("\n", ""),
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        | ORDER BY c_custkey""".stripMargin.replace("\n", ""),
    "q_outer_join_count" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        | FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey ORDER BY c_custkey""".stripMargin.replace("\n", ""),
    "q_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        | ntile(4) OVER w::BIGINT AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist
        | FROM orders WHERE o_orderkey <= 3000
        | WINDOW w AS (PARTITION BY o_orderpriority
        |              ORDER BY o_totalprice, o_orderkey)
        | ORDER BY o_orderpriority, o_orderkey"""
        .stripMargin.replace("\n", ""),
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"""
        .stripMargin.replace("\n", ""),
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        | FROM orders ORDER BY o_custkey, o_orderkey"""
        .stripMargin.replace("\n", ""),
    "q_window_frames" ->
      """SELECT o_orderkey, o_custkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY
        |   date_diff('day', DATE '1990-01-01', o_orderdate::DATE)
        |   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS sum_30d,
        | ntile(4) OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice, o_orderkey)::BIGINT AS price_quartile,
        | round(percent_rank() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice, o_orderkey), 6) AS pct_rank
        | FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", ""),

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        | round(coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
        | FROM orders ORDER BY o_custkey, o_orderkey"""
        .stripMargin.replace("\n", ""),
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""
        .stripMargin.replace("\n", ""),
    "q_union" ->
      """SELECT c_nationkey AS nk FROM customer
        | UNION SELECT s_nationkey AS nk FROM supplier ORDER BY nk"""
        .stripMargin.replace("\n", ""),
    "q_intersect" ->
      """SELECT c_custkey AS ck FROM customer
        | INTERSECT SELECT o_custkey AS ck FROM orders ORDER BY ck"""
        .stripMargin.replace("\n", ""),
    "q_except" ->
      """SELECT DISTINCT o_custkey AS ck FROM orders
        | EXCEPT SELECT c_custkey AS ck FROM customer
        |   WHERE c_mktsegment = 'BUILDING'
        | ORDER BY ck""".stripMargin.replace("\n", ""),
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | round(sum(l_quantity), 2) AS sum_qty
        | FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        | ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin.replace("\n", ""),
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        | FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        | ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin.replace("\n", ""),
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt
        | FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        | ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin.replace("\n", ""),
    "q_pivot" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        | CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),
    "q_unpivot" ->
      """WITH b AS (SELECT * FROM lineitem WHERE l_orderkey <= 300)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, metric, val FROM (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |   'l_quantity' AS metric, l_quantity AS val FROM b
        | UNION ALL SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |   'l_extendedprice', l_extendedprice FROM b
        | UNION ALL SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |   'l_discount', l_discount FROM b
        | UNION ALL SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |   'l_tax', l_tax FROM b) u
        | ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, metric"""
        .stripMargin.replace("\n", ""),
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        | WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        | ORDER BY o_orderkey""".stripMargin.replace("\n", ""),
    "q_corr_subquery" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        | WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
        |                       WHERE o2.o_custkey = o.o_custkey)
        | ORDER BY o_custkey, o_orderkey""".stripMargin.replace("\n", "")
  )
}
