package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The second half of the TPC-H decision-support suite — the ten query
  * shapes RelationalQueries does not already cover — adapted to the
  * fixture's reduced star schema (no partsupp / commitdate / phone; see
  * TESTDATA.md). Each adaptation keeps the PLAN SHAPE the original
  * exercises, which is the point of carrying it:
  *
  *   - Q2: correlated scalar-aggregate subquery over a JOIN CHAIN
  *     (min-cost supplier) — the decorrelation stress test;
  *   - Q4: EXISTS with a non-equality correlated predicate → semi join
  *     with a composite condition;
  *   - Q9: many-way fact join with arithmetic between both sides;
  *   - Q11: group-agg HAVING against a global one-row aggregate;
  *   - Q12: CASE-bucketed conditional counts over a fact-fact join;
  *   - Q13: LEFT OUTER with a join-side (not WHERE) filter, then a
  *     distribution-of-counts re-aggregation;
  *   - Q16: NOT IN → null-aware anti join + count distinct;
  *   - Q20: IN subquery whose body carries its own correlated scalar
  *     aggregate (dominant-supplier threshold);
  *   - Q21: EXISTS and NOT EXISTS against the same fact self-join;
  *   - Q22: scalar-subquery threshold + anti join + substring grouping.
  *
  * The partsupp-derived relations are re-expressed over lineitem (the
  * only part×supplier relation in the fixture): "supply cost" is the
  * minimum observed extended price in cents, "available quantity" is
  * shipped quantity. Missing commit/receipt dates become shipping
  * latency vs the order date. All money flows as exact integer cents /
  * 10⁻⁴-dollar units (the cross-engine float-parity rule used by every
  * other TPC-H query here); every query ends in a total ORDER BY.
  *
  * Scale notes: dims broadcast; the one fact-fact shuffle per query is
  * keyed on the join key; Q11/Q22 thresholds ride one-row broadcast
  * scalar subqueries, never a second scan-side pass; Q21's two
  * existence probes reuse the same l_orderkey exchange.
  */
object TpchDeepQueries extends QueryModule {

  private def views(s: SparkSession, d: String, pfx: String,
      names: String*): Unit =
    names.foreach(t => Tables(s, d, t).createOrReplaceTempView(s"${pfx}_$t"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q2 (minimum-cost supplier) as SQL TEXT: for each mid-size
    // STANDARD part, the EUROPE suppliers that ship it at the lowest
    // observed price. The correlated scalar-aggregate subquery spans a
    // four-table join chain — Catalyst must decorrelate it into a
    // per-partkey min aggregate joined back (no nested-loop re-execution
    // per outer row; PlanAuditSpec pins the absence of CartesianProduct).
    // `ps` (the part×supplier cost relation) is STAGED, not a CTE:
    // Spark inlines WITH bodies, and this one is referenced by both the
    // outer query and the correlated subquery — un-staged, the lineitem
    // scan+aggregate (the query's dominant cost) runs twice, measured
    // 0.50 exp/decade on the 100× sweep vs 2× less work staged. The
    // decorrelation shape under test lives in the subquery, which is
    // unchanged.
    "q_tpch_q2" -> ((s, d) => {
      views(s, d, "tq2", "part", "supplier", "nation", "region")
      StagedCache.persist(Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("cost_c")))
        .createOrReplaceTempView("tq2_ps")
      s.sql("""SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
              |  s_name, n_name, p_partkey, cost_c
              | FROM tq2_ps ps
              | JOIN tq2_part ON pk = p_partkey
              | JOIN tq2_supplier ON sk = s_suppkey
              | JOIN tq2_nation ON s_nationkey = n_nationkey
              | JOIN tq2_region ON n_regionkey = r_regionkey
              | WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
              |   AND r_name = 'EUROPE'
              |   AND cost_c = (SELECT min(ps2.cost_c)
              |                 FROM tq2_ps ps2
              |                 JOIN tq2_supplier s2 ON ps2.sk = s2.s_suppkey
              |                 JOIN tq2_nation n2 ON s2.s_nationkey = n2.n_nationkey
              |                 JOIN tq2_region r2 ON n2.n_regionkey = r2.r_regionkey
              |                 WHERE ps2.pk = p_partkey AND r2.r_name = 'EUROPE')
              | ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
              | LIMIT 100""".stripMargin)
    }),

    // TPC-H Q4 (order-priority checking): orders from one quarter with
    // at least one late line (shipped > 60 days after the order date —
    // the fixture's stand-in for commitdate < receiptdate). The EXISTS
    // becomes ONE left-semi join on the order key with the lateness
    // comparison as a residual join condition — lineitem is never
    // aggregated or deduplicated first.
    "q_tpch_q4" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").cast("date") >= lit("1997-01-01").cast("date") &&
                col("o_orderdate").cast("date") < lit("1997-04-01").cast("date"))
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate").cast("date") >
            date_add(o("o_orderdate").cast("date"), 60),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q9 (product-type profit): profit per supplier nation and
    // order year over one part family. Supply cost is re-derived as
    // 50% of the part's retail price (the fixture has no partsupp), so
    // profit_u = rev_u − retail_cents·qty·50 stays an exact integer in
    // 10⁻⁴-dollar units. Part (selective, broadcast) prunes lineitem
    // BEFORE the orders shuffle; supplier→nation broadcasts.
    "q_tpch_q9" -> ((s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_name").contains("bolt"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("retail_c"))
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_u"),
          round(col("l_quantity")).cast("long").as("qty"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "o_year")
        .agg(sum(col("rev_u") - col("retail_c") * col("qty") * lit(50L))
          .as("profit_u"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // TPC-H Q11 (important stock): per-part shipped value from one
    // nation's suppliers, kept when above a threshold of the nation's
    // total. The global threshold is a ONE-ROW aggregate of the same
    // staged value table broadcast back over it — the value table is
    // computed once (StagedCache), not re-scanned, and the compare is
    // exact integer DIV. Spec Q11 uses FRACTION = 0.0001/SF, i.e. the
    // cut scales with corpus size; mirroring that, the threshold here
    // is 2× the mean per-part value (t DIV (2·nparts)), which keeps
    // the result non-degenerate at every scale factor instead of
    // emptying out as the part count grows past a fixed divisor.
    "q_tpch_q11" -> ((s, d) => {
      val suppliers = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
        .select("s_suppkey")
      val v = StagedCache.persist(Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * round(col("l_quantity")).cast("long")).as("val_u"))
        .join(broadcast(suppliers), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum("val_u").as("value_u")))
      val tot = v.agg(sum("value_u").as("t"), count(lit(1)).as("np"))
      v.crossJoin(broadcast(tot))
        .filter(col("value_u") > expr("t DIV (2 * np)"))
        .select("l_partkey", "value_u")
        .orderBy(col("value_u").desc, col("l_partkey"))
    }),

    // TPC-H Q12 (shipping lateness vs priority): lines bucketed by how
    // late they shipped after the order date, with conditional counts
    // of high- vs low-priority orders per bucket. One fact-fact shuffle
    // on the order key; the CASE arithmetic is integral throughout.
    "q_tpch_q12" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01").cast("date") &&
                col("l_shipdate").cast("date") < lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship_d"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("order_d"),
          col("o_orderpriority"))
      val lateness = datediff(col("ship_d"), col("order_d"))
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(
          when(lateness > 90, "LATE").when(lateness > 30, "SLOW")
            .otherwise("FAST").as("ship_bucket"),
          isHigh.as("hi"))
        .groupBy("ship_bucket")
        .agg(sum("hi").as("high_line_count"),
             sum(lit(1L) - col("hi")).as("low_line_count"))
        .orderBy("ship_bucket")
    }),

    // TPC-H Q13 (customer distribution): how many customers placed
    // exactly N qualifying orders, INCLUDING zero — which is why the
    // priority filter must live in the OUTER JOIN's ON clause, not a
    // WHERE (a WHERE would silently drop the zero-order customers).
    // Two aggregations: per-customer count, then the count histogram.
    "q_tpch_q13" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d).select("o_custkey", "o_orderkey",
        "o_orderpriority")
      c.join(o,
          c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "5-LOW",
          "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q16 (supplier relationship counting) as SQL TEXT: distinct
    // suppliers per (brand, size) for selected part classes, EXCLUDING
    // suppliers in deficit — the NOT IN is the null-aware anti-join
    // shape (s_suppkey is non-null here, but the planner must still
    // prove it or plan the null-aware variant).
    "q_tpch_q16" -> ((s, d) => {
      views(s, d, "tq16", "lineitem", "part", "supplier")
      s.sql("""SELECT p_brand, p_size,
              |  count(DISTINCT l_suppkey) AS supplier_cnt
              | FROM tq16_lineitem JOIN tq16_part ON p_partkey = l_partkey
              | WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              |   AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              |   AND l_suppkey NOT IN (SELECT s_suppkey FROM tq16_supplier
              |                         WHERE s_acctbal < 0)
              | GROUP BY p_brand, p_size
              | ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)
    }),

    // TPC-H Q20 (potential part promotion) as SQL TEXT: suppliers who
    // DOMINATED shipments of a red part in 1997 — shipped more than
    // half of the part's total (the fixture's stand-in for
    // ps_availqty > ½·Σqty). An IN subquery whose body carries its own
    // correlated scalar aggregate: Catalyst decorrelates the inner sum
    // into a per-part total joined to the per-(part,supplier) rows,
    // then semi-joins the surviving supplier keys.
    "q_tpch_q20" -> ((s, d) => {
      views(s, d, "tq20", "lineitem", "part", "supplier", "nation")
      s.sql("""WITH shipped AS (
              |  SELECT l_partkey AS pk, l_suppkey AS sk,
              |    sum(CAST(round(l_quantity) AS BIGINT)) AS qty
              |  FROM tq20_lineitem JOIN tq20_part ON p_partkey = l_partkey
              |  WHERE p_name LIKE 'red%'
              |    AND year(CAST(l_shipdate AS DATE)) = 1997
              |  GROUP BY l_partkey, l_suppkey)
              |SELECT s_suppkey, s_name, n_name
              | FROM tq20_supplier JOIN tq20_nation ON s_nationkey = n_nationkey
              | WHERE s_suppkey IN (
              |   SELECT sk FROM shipped sh
              |   WHERE sh.qty * 2 > (SELECT sum(qty) FROM shipped st
              |                       WHERE st.pk = sh.pk))
              | ORDER BY s_suppkey""".stripMargin)
    }),

    // TPC-H Q21 (suppliers who kept orders waiting) as SQL TEXT: ASIA
    // suppliers whose line shipped late (> 60 days after the order
    // date) on a multi-supplier order where NO OTHER supplier was late.
    // EXISTS and NOT EXISTS probe the same lineitem self-join key —
    // a left-semi and a left-anti over one l_orderkey exchange; the
    // lateness predicate inside NOT EXISTS re-joins orders so every
    // correlation stays an equality.
    "q_tpch_q21" -> ((s, d) => {
      views(s, d, "tq21", "lineitem", "orders", "supplier", "nation", "region")
      s.sql("""SELECT s_name, count(*) AS numwait
              | FROM tq21_supplier
              | JOIN tq21_nation ON s_nationkey = n_nationkey
              | JOIN tq21_region ON n_regionkey = r_regionkey
              | JOIN tq21_lineitem l1 ON s_suppkey = l1.l_suppkey
              | JOIN tq21_orders o1 ON o1.o_orderkey = l1.l_orderkey
              | WHERE r_name = 'ASIA'
              |   AND CAST(l1.l_shipdate AS DATE) >
              |       date_add(CAST(o1.o_orderdate AS DATE), 60)
              |   AND EXISTS (SELECT 1 FROM tq21_lineitem l2
              |               WHERE l2.l_orderkey = l1.l_orderkey
              |                 AND l2.l_suppkey <> l1.l_suppkey)
              |   AND NOT EXISTS (SELECT 1 FROM tq21_lineitem l3
              |                   JOIN tq21_orders o3
              |                     ON o3.o_orderkey = l3.l_orderkey
              |                   WHERE l3.l_orderkey = l1.l_orderkey
              |                     AND l3.l_suppkey <> l1.l_suppkey
              |                     AND CAST(l3.l_shipdate AS DATE) >
              |                         date_add(CAST(o3.o_orderdate AS DATE), 60))
              | GROUP BY s_name
              | ORDER BY numwait DESC, s_name""".stripMargin)
    }),

    // TPC-H Q22 (global sales opportunity) as SQL TEXT: dormant
    // high-balance customers by "country code" (last two digits of the
    // customer name — the fixture has no phone column), where dormant
    // means NO URGENT ORDERS (the fixture's every-customer-orders
    // density makes the original no-orders form empty at every SF).
    // The above-average-balance threshold is the integer-exact cross
    // multiply bal·n > Σbal — no double division is ever compared, so
    // both engines cut identically. Two one-row scalar subqueries
    // (broadcast), one anti join, substring grouping.
    "q_tpch_q22" -> ((s, d) => {
      views(s, d, "tq22", "customer", "orders")
      s.sql("""WITH pot AS (SELECT substr(c_name, 17, 2) AS cntrycode,
              |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c, c_custkey
              |  FROM tq22_customer
              |  WHERE substr(c_name, 17, 2) IN
              |    ('11', '13', '17', '23', '29', '31', '37'))
              |SELECT cntrycode, count(*) AS numcust,
              |  sum(bal_c) AS totacctbal_c
              | FROM pot
              | WHERE bal_c * (SELECT count(*) FROM pot WHERE bal_c > 0)
              |       > (SELECT sum(bal_c) FROM pot WHERE bal_c > 0)
              |   AND NOT EXISTS (SELECT 1 FROM tq22_orders
              |                   WHERE o_custkey = c_custkey
              |                     AND o_orderpriority = '1-URGENT')
              | GROUP BY cntrycode
              | ORDER BY cntrycode""".stripMargin)
    })
  )

  def oracle: Map[String, String] = Map(
    "q_tpch_q2" ->
      """WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk,
        |    min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |  s_name, n_name, p_partkey, cost_c
        | FROM ps, part, supplier, nation, region
        | WHERE pk = p_partkey AND sk = s_suppkey
        |   AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
        |   AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |   AND r_name = 'EUROPE'
        |   AND cost_c = (SELECT min(ps2.cost_c)
        |                 FROM ps ps2, supplier s2, nation n2, region r2
        |                 WHERE ps2.pk = p_partkey AND ps2.sk = s2.s_suppkey
        |                   AND s2.s_nationkey = n2.n_nationkey
        |                   AND n2.n_regionkey = r2.r_regionkey
        |                   AND r2.r_name = 'EUROPE')
        | ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
        | LIMIT 100""".stripMargin.replace("\n", ""),

    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS order_count
        | FROM orders
        | WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |   AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
        |   AND EXISTS (SELECT 1 FROM lineitem
        |               WHERE l_orderkey = o_orderkey
        |                 AND CAST(l_shipdate AS DATE) >
        |                     CAST(o_orderdate AS DATE) + 60)
        | GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q9" ->
      """SELECT n_name, year(CAST(o_orderdate AS DATE))::BIGINT AS o_year,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |        * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |      - CAST(round(p_retailprice * 100) AS BIGINT)
        |        * CAST(round(l_quantity) AS BIGINT) * 50)::BIGINT AS profit_u
        | FROM lineitem
        | JOIN part ON p_partkey = l_partkey
        | JOIN orders ON o_orderkey = l_orderkey
        | JOIN supplier ON s_suppkey = l_suppkey
        | JOIN nation ON n_nationkey = s_nationkey
        | WHERE p_name LIKE '%bolt%'
        | GROUP BY 1, 2 ORDER BY n_name, o_year DESC"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q11" ->
      """WITH v AS (SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * CAST(round(l_quantity) AS BIGINT))::BIGINT AS value_u
        |  FROM lineitem
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY 1)
        |SELECT l_partkey, value_u FROM v
        | WHERE value_u > (SELECT (sum(value_u) // (2 * count(*)))::BIGINT FROM v)
        | ORDER BY value_u DESC, l_partkey""".stripMargin.replace("\n", ""),

    "q_tpch_q12" ->
      """SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                 CAST(l_shipdate AS DATE)) > 90 THEN 'LATE'
        |            WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |                 CAST(l_shipdate AS DATE)) > 30 THEN 'SLOW'
        |            ELSE 'FAST' END AS ship_bucket,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        | FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        | WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |   AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        | GROUP BY 1 ORDER BY ship_bucket""".stripMargin.replace("\n", ""),

    "q_tpch_q13" ->
      """SELECT c_count, count(*)::BIGINT AS custdist
        | FROM (SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |       FROM customer LEFT JOIN orders
        |         ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |       GROUP BY c_custkey) cc
        | GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q16" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey)::BIGINT
        |    AS supplier_cnt
        | FROM lineitem JOIN part ON p_partkey = l_partkey
        | WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |   AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |   AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                         WHERE s_acctbal < 0)
        | GROUP BY p_brand, p_size
        | ORDER BY supplier_cnt DESC, p_brand, p_size"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q20" ->
      """WITH shipped AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND year(CAST(l_shipdate AS DATE)) = 1997
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name
        | FROM supplier JOIN nation ON s_nationkey = n_nationkey
        | WHERE s_suppkey IN (
        |   SELECT sk FROM shipped sh
        |   WHERE sh.qty * 2 > (SELECT sum(qty)::BIGINT FROM shipped st
        |                       WHERE st.pk = sh.pk))
        | ORDER BY s_suppkey""".stripMargin.replace("\n", ""),

    "q_tpch_q21" ->
      """SELECT s_name, count(*)::BIGINT AS numwait
        | FROM supplier
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        | JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        | JOIN orders o1 ON o1.o_orderkey = l1.l_orderkey
        | WHERE r_name = 'ASIA'
        |   AND CAST(l1.l_shipdate AS DATE) >
        |       CAST(o1.o_orderdate AS DATE) + 60
        |   AND EXISTS (SELECT 1 FROM lineitem l2
        |               WHERE l2.l_orderkey = l1.l_orderkey
        |                 AND l2.l_suppkey <> l1.l_suppkey)
        |   AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                   JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |                   WHERE l3.l_orderkey = l1.l_orderkey
        |                     AND l3.l_suppkey <> l1.l_suppkey
        |                     AND CAST(l3.l_shipdate AS DATE) >
        |                         CAST(o3.o_orderdate AS DATE) + 60)
        | GROUP BY s_name ORDER BY numwait DESC, s_name"""
        .stripMargin.replace("\n", ""),

    "q_tpch_q22" ->
      """WITH pot AS (SELECT substr(c_name, 17, 2) AS cntrycode,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c, c_custkey
        |  FROM customer
        |  WHERE substr(c_name, 17, 2) IN
        |    ('11', '13', '17', '23', '29', '31', '37'))
        |SELECT cntrycode, count(*)::BIGINT AS numcust,
        |  sum(bal_c)::BIGINT AS totacctbal_c
        | FROM pot
        | WHERE bal_c * (SELECT count(*) FROM pot WHERE bal_c > 0)
        |       > (SELECT sum(bal_c) FROM pot WHERE bal_c > 0)
        |   AND NOT EXISTS (SELECT 1 FROM orders
        |                   WHERE o_custkey = c_custkey
        |                     AND o_orderpriority = '1-URGENT')
        | GROUP BY cntrycode
        | ORDER BY cntrycode""".stripMargin.replace("\n", "")
  )
}
