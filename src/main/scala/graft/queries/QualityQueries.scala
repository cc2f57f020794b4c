package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-quality validation and profiling — the Deequ/Great-Expectations
  * capability band: declarative checks and single-pass profiles a
  * pipeline runs BEFORE trusting a 100 TB delivery. (The reference has
  * no validation surface; its closest artifact is the malformed-line
  * counter in `trace-insertindex-job/.../TraceInsertIndexMapper.java:39-43`
  * — the P5 parse guard these checks generalize.)
  *
  * Design rules: every check is a scan-shaped aggregate or an anti-join
  * (both data-linear, no check adds a second pass over what another
  * check already scanned when they share a table — one agg computes all
  * of a table's row-level checks); profile output is one ROW per column
  * (wide scan, narrow result) so a 400-column table profiles in one
  * pass with bounded output.
  */
object QualityQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Declarative data-quality checks, one result row per check:
    // completeness (null rate), uniqueness (key distinct = rows),
    // referential integrity (fact keys ⊆ dimension keys, via anti-join
    // count), range conformance, and accepted-values conformance. Each
    // check emits (check_name, metric, passed); per-table row-level
    // checks share ONE aggregate scan.
    "q_data_checks" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      // lineitem row-level checks: one scan, one aggregate row.
      val liAgg = li.agg(
        sum(col("l_shipdate").isNull.cast("long")).as("null_ship"),
        sum((!col("l_quantity").between(1, 50)).cast("long")).as("bad_qty"),
        sum((!col("l_returnflag").isin("A", "N", "R")).cast("long"))
          .as("bad_flag"))
      val liChecks = liAgg.select(explode(array(
        struct(lit("lineitem.completeness.l_shipdate").as("check_name"),
          col("null_ship").as("metric"), (col("null_ship") === 0).as("passed")),
        struct(lit("lineitem.range.l_quantity_1_50").as("check_name"),
          col("bad_qty").as("metric"), (col("bad_qty") === 0).as("passed")),
        struct(lit("lineitem.accepted.l_returnflag_ANR").as("check_name"),
          col("bad_flag").as("metric"), (col("bad_flag") === 0).as("passed"))))
        .as("c")).select("c.*")
      // orders.o_orderkey uniqueness: distinct = rows (one shuffle on
      // the key via the distinct; both counts in one result row).
      val uniq = ord.agg(count(lit(1)).as("n"),
        count_distinct(col("o_orderkey")).as("nd"))
        .select(lit("orders.unique.o_orderkey").as("check_name"),
          (col("n") - col("nd")).as("metric"),
          (col("n") === col("nd")).as("passed"))
      // A check that FAILS on this data (c_mktsegment is 5-valued, so
      // uniqueness is violated by construction): pins the checker's
      // fail path — metric counts the duplicate rows, passed=false —
      // through the oracle, so an all-green report is a finding, not
      // the only reachable output.
      val failing = cust.agg(count(lit(1)).as("n"),
        count_distinct(col("c_mktsegment")).as("nd"))
        .select(lit("customer.unique.c_mktsegment").as("check_name"),
          (col("n") - col("nd")).as("metric"),
          (col("n") === col("nd")).as("passed"))
      // Referential integrity: orders.o_custkey ⊆ customer.c_custkey.
      // Anti-join on the key — the dimension broadcasts when small,
      // shuffles when not; either way one pass over the fact. NULL FKs
      // are excluded up front (they are a completeness question, not an
      // RI one) so the count is engine-independent: a left-anti counts
      // null keys as non-matches while SQL NOT IN drops them.
      val ri = ord.select(col("o_custkey"))
        .filter(col("o_custkey").isNotNull)
        .join(cust.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("viol"))
        .select(lit("orders.ri.o_custkey_in_customer").as("check_name"),
          col("viol").as("metric"), (col("viol") === 0).as("passed"))
      liChecks.unionByName(uniq).unionByName(failing).unionByName(ri)
        .orderBy("check_name")
    }),

    // Column profiler over lineitem — per column: null count, distinct
    // cardinality, min/max. The naive form (one agg with N
    // count_distincts) plans an Expand that ships N copies of the
    // table through the shuffle — measured 6.3 s at sf0.1, linear in
    // N×data. The scale shape used here: null/min/max ride ONE wide
    // non-distinct aggregate (no Expand), and distincts come from a
    // map-side unpivot to (column, value-hash) folded into a KMV
    // sketch per column — the shuffle carries ≤ k longs per (column,
    // partition) no matter the table size, and the estimate is EXACT
    // below k (the flags) and within 2/√k above it. Numeric columns
    // hash a micro-unit integer rendering so both engines canonicalize
    // doubles identically.
    "q_column_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val k = 4096
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus")
      def canon(c: String): Column = c match {
        case "l_quantity" | "l_extendedprice" =>
          round(col(c) * 1e6).cast("long").cast("string")
        case _ => col(c).cast("string")
      }
      // ONE scan: the per-column KMV sketches fold into the same wide
      // aggregate as the declarative stats (count/nulls/min/max), then
      // a row-count-5 explode unpivots the single result row. The
      // previous shape ran a SECOND lineitem scan (explode→hash→kmv
      // grouped by column name) joined back — at 100 TB that is 2×
      // the table I/O for the same answer; A/B at sf0.1 (round-14,
      // ColumnProfileAB): two-scan 1.76-1.89 s vs single-scan
      // 1.65-1.76 s, identical results asserted row-for-row. (The r13
      // bench's 2.22 s median for the old shape was in-suite
      // measurement context, not a plan change — standalone it
      // re-measured at 1.76 s.)
      val wide = li.agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          sum(col(c).isNull.cast("long")).as(s"${c}_nulls"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"),
          graft.functions.KmvDistinctAgg(
            graft.functions.TextFunctions.hash60(canon(c)), k)
            .as(s"${c}_sk"))): _*)
      wide.select(col("n_rows"), explode(array(cols.map(c =>
        struct(lit(c).as("column_name"),
          col(s"${c}_nulls").as("n_nulls"),
          col(s"${c}_sk.est").as("n_distinct_est"),
          col(s"${c}_min").as("min_str"),
          col(s"${c}_max").as("max_str"))): _*)).as("p"))
        .select(col("p.column_name"), col("n_rows"), col("p.n_nulls"),
          col("p.n_distinct_est"), col("p.min_str"), col("p.max_str"))
        .orderBy("column_name")
    }),

    // Hourly event-rate anomaly detection: per-hour counts, then each
    // hour scored against the TRAILING 24-hour window (mean in exact
    // micro-units — integer sums divided once, so both engines agree
    // bit-for-bit; the window frame is rows-bounded so no engine
    // buffers more than 24 rows per partition). An hour is anomalous
    // when its count exceeds 2× the trailing mean — the burst monitor
    // a streaming ingest would alert on. The hour spine is the
    // OBSERVED hours (count ≥ 1 each); at 100 TB the per-hour rollup
    // is the only data-proportional stage, and the window runs over
    // #hours rows, not events.
    "q_rate_anomaly" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.orderBy("hour").rowsBetween(-24, -1)
      // The global orderBy window runs over the tiny hourly rollup
      // (#hours rows), not the corpus — same bounded-single-partition
      // pattern as q_pack_sequences' prefix stage.
      hourly
        .withColumn("trail_sum", sum(col("n_events")).over(w))
        .withColumn("trail_n", count(col("n_events")).over(w))
        .filter(col("trail_n") >= 6)
        .withColumn("trail_mean_u",
          expr("CAST((trail_sum * 1000000) DIV trail_n AS BIGINT)"))
        .withColumn("is_anomaly",
          col("n_events") * lit(1000000L) > col("trail_mean_u") * 2)
        .select(col("hour"), col("n_events"), col("trail_mean_u"),
          col("is_anomaly"))
        .orderBy("hour")
    })
  )

  def oracle: Map[String, String] = Map(
    "q_data_checks" ->
      """WITH li AS (SELECT count(*) AS n,
        |   sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_ship,
        |   sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
        |     AS bad_qty,
        |   sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END)
        |     AS bad_flag
        |  FROM lineitem),
        | ord AS (SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd
        |  FROM orders),
        | ri AS (SELECT count(*) AS viol FROM orders o
        |  WHERE o_custkey IS NOT NULL AND NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |SELECT * FROM (
        | SELECT 'lineitem.completeness.l_shipdate' AS check_name,
        |   null_ship::BIGINT AS metric, null_ship = 0 AS passed FROM li
        | UNION ALL SELECT 'lineitem.range.l_quantity_1_50',
        |   bad_qty::BIGINT, bad_qty = 0 FROM li
        | UNION ALL SELECT 'lineitem.accepted.l_returnflag_ANR',
        |   bad_flag::BIGINT, bad_flag = 0 FROM li
        | UNION ALL SELECT 'orders.unique.o_orderkey',
        |   (n - nd)::BIGINT, n = nd FROM ord
        | UNION ALL SELECT 'customer.unique.c_mktsegment',
        |   (n - nd)::BIGINT, n = nd FROM
        |   (SELECT count(*) AS n, count(DISTINCT c_mktsegment) AS nd
        |    FROM customer)
        | UNION ALL SELECT 'orders.ri.o_custkey_in_customer',
        |   viol::BIGINT, viol = 0 FROM ri)
        |ORDER BY check_name""".stripMargin.replace("\n", ""),

    "q_column_profile" -> {
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus")
      def canonSql(c: String): String = c match {
        case "l_quantity" | "l_extendedprice" =>
          s"round($c * 1e6)::BIGINT::VARCHAR"
        case _ => s"$c::VARCHAR"
      }
      // Mirror of the KMV estimate at k=4096 (q_corpus_stats_sketch
      // precedent): exact below k, else the order-statistics estimator
      // on the 4096th smallest distinct hash.
      val arms = cols.map { c =>
        s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
           | sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
           | (SELECT coalesce((CASE WHEN max(rn) < 4096 THEN max(rn)
           |    ELSE round(4095.0 * 1152921504606846976.0 /
           |      max(CASE WHEN rn = 4096 THEN h END), 0) END)::BIGINT, 0)
           |   FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
           |     FROM (SELECT DISTINCT ${OracleSql.hash60(canonSql(c))} AS h
           |       FROM lineitem WHERE $c IS NOT NULL)))
           |   AS n_distinct_est,
           | min($c)::VARCHAR AS min_str, max($c)::VARCHAR AS max_str
           | FROM lineitem""".stripMargin
      }
      arms.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY column_name")
        .replace("\n", "")
    },

    "q_rate_anomaly" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
        |   count(*)::BIGINT AS n_events FROM events GROUP BY 1),
        | t AS (SELECT hour, n_events,
        |   sum(n_events) OVER (ORDER BY hour
        |     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_sum,
        |   count(n_events) OVER (ORDER BY hour
        |     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_n
        |  FROM h)
        |SELECT hour, n_events,
        | ((trail_sum * 1000000) // trail_n)::BIGINT AS trail_mean_u,
        | n_events * 1000000 > ((trail_sum * 1000000) // trail_n) * 2
        |   AS is_anomaly
        | FROM t WHERE trail_n >= 6 ORDER BY hour"""
        .stripMargin.replace("\n", "")
  )
}
