package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar function surface (SURVEY §2.8): string, date/time, math,
  * conditional/null handling. All expressions are Spark built-ins —
  * whole-stage-codegen'd, no UDFs — and chosen so semantics match ANSI /
  * DuckDB exactly (same 1-based substring, same HALF-UP rounding on
  * positive values, same null propagation).
  *
  * Output types are normalized to the oracle's (e.g. `length` → BIGINT)
  * so the driver's schema compare is stable.
  */
object ScalarQueries extends QueryModule {

  /** The rank-bound gate behind q_percentiles_approx: given per-group
    * claimed quantiles `approx(rf, a50, a90)` and the raw values
    * `li(l_returnflag, l_extendedprice)`, emit per-group booleans
    * asserting each claimed value's rank sits within ±n·eps+1 of its
    * target rank — the GK sketch's published guarantee. Public so the
    * negative test (FunctionsSpec) can feed a POISONED approx table
    * through the same gate and prove it trips; the oracle for the query
    * is a tolerance self-check, so falsifiability must be demonstrated
    * test-side. */
  def rankGate(li: DataFrame, approx: DataFrame, epsVal: Double): DataFrame = {
    val eps = lit(epsVal)
    def rankOk(lt: Column, le: Column, n: Column, p: Double): Column =
      (le.cast("double") >= n.cast("double") * p - n.cast("double") * eps - 1.0) &&
      (lt.cast("double") <= n.cast("double") * p + n.cast("double") * eps + 1.0)
    val counted = li.join(broadcast(approx), col("l_returnflag") === col("rf"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("a50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("a50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_extendedprice") < col("a90"), 1L).otherwise(0L)).as("lt90"),
        sum(when(col("l_extendedprice") <= col("a90"), 1L).otherwise(0L)).as("le90"))
    counted.select(col("l_returnflag"), col("n"),
        rankOk(col("lt50"), col("le50"), col("n"), 0.5).as("p50_rank_ok"),
        rankOk(col("lt90"), col("le90"), col("n"), 0.9).as("p90_rank_ok"))
      .orderBy("l_returnflag")
  }

  /** EXACT interpolated percentiles by distributed rank selection —
    * the scale-safe form of `percentile()`. The built-in exact
    * aggregate buffers EVERY value per group (unbounded state, the one
    * scale-killer flagged in the round-5 review), and the obvious
    * window-rank replacement still funnels each whole GROUP through
    * one task (the window contract). This form has neither limit:
    *
    *  1. range-partition by (group, value) — a group's sort order is
    *     SPLIT ACROSS partitions, each bounded by data/numPartitions;
    *  2. per-(partition, group) row counts (a tiny table) become
    *     global rank offsets via a prefix sum over partition ids —
    *     the same two-phase shape as q_pack_sequences' token
    *     prefix-sum, broadcast back;
    *  3. local row_number within (partition, group) + offset = exact
    *     global rank; each percentile needs only the rows at ranks
    *     ⌊p·(n−1)⌋ / ⌈p·(n−1)⌉, filtered before any aggregation.
    *
    * The interpolation reproduces `Percentile.getPercentile`
    * bit-for-bit — the products `(higher−pos)·v_lo` / `(pos−lower)·v_hi`
    * and their one sum are the same IEEE operations (multiplication
    * and a single addition are commutative; only reassociation would
    * diverge) — so the DuckDB `quantile_cont` mirror is unchanged.
    * Ties straddling a range boundary are safe: equal values get
    * arbitrary adjacent ranks and contribute the same value.
    *
    * TIE SKEW: the range key carries a unique tiebreaker (`_tb`) after
    * the value, because `repartitionByRange` cannot split equal keys —
    * without it, a group that is 90% one value lands 90% of its rows in
    * ONE partition and the "bounded by data/numPartitions" claim dies
    * exactly on the adversarial distributions that need it. With the
    * tiebreaker, equal values spread across partitions; cross-partition
    * rank order among ties follows `_tb` (a total order consistent with
    * `_v`), and the interpolation is tie-invariant, so results are
    * unchanged. PercentileRankSpec pins both properties: bit-identity,
    * and max-partition-rows ≈ n/nPart on a 90%-tied column.
    *
    * The ranged frame is PERSISTED before the two consumers below
    * derive from it: `_pid` (spark_partition_id) and `_tb`
    * (monotonically_increasing_id) are both recomputation-unstable, and
    * the offsets branch and the base branch must observe the SAME
    * partition layout. Without the persist that agreement silently
    * rides on exchange reuse (one canonicalization miss, or
    * spark.sql.exchange.reuse=false, and the inner join on
    * (_pid, group) drops rows with no error). The persist is two narrow
    * columns plus the key — not the full input width. */
  /** Phase-1 layout of [[exactPercentilesByRank]], split out so the
    * spec can assert the tie-skew balance property on the exact frame
    * the percentile path uses (not a reimplementation). */
  private[queries] def rangedByValue(df: DataFrame, group: String, v: String,
      nPart: Int): DataFrame =
    df.filter(col(v).isNotNull)
      .select(col(group), col(v).cast("double").as("_v"))
      .withColumn("_tb", monotonically_increasing_id())
      .repartitionByRange(nPart, col(group), col("_v"), col("_tb"))
      .withColumn("_pid", spark_partition_id())

  private[queries] def exactPercentilesByRank(df: DataFrame, group: String,
      v: String, ps: Seq[(Double, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = StagedCache.persist(rangedByValue(df, group, v, nPart))
    // Tiny: ≤ numPartitions × groups rows. Offset of a (pid, group)
    // block = rows of the group in earlier partitions; _n = group total.
    val wGroup = Window.partitionBy(group).orderBy("_pid")
    val offsets = ranged.groupBy("_pid", group).agg(count(lit(1)).as("_c"))
      .withColumn("_off",
        coalesce(sum(col("_c")).over(wGroup.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("_n",
        sum(col("_c")).over(Window.partitionBy(group)).cast("double"))
      .drop("_c")
    val base = ranged
      .withColumn("_lrn", row_number().over(
        Window.partitionBy("_pid", group).orderBy(col("_v"), col("_tb"))))
      .join(broadcast(offsets), Seq("_pid", group))
      .withColumn("_rn", (col("_lrn") - 1 + col("_off")).cast("double"))
    def pos(p: Double) = lit(p) * (col("_n") - 1)
    // Keep only the ≤ 2·|ps| boundary rows per group before aggregating.
    val boundary = ps.map { case (p, _) =>
      col("_rn") === floor(pos(p)) || col("_rn") === ceil(pos(p))
    }.reduce(_ || _)
    val aggs = ps.map { case (p, name) =>
      val position = pos(p)
      val lower = floor(position)
      val higher = ceil(position)
      sum(
        when(lower === higher,
          when(col("_rn") === lower, col("_v")).otherwise(lit(0.0)))
        .otherwise(
          when(col("_rn") === lower, (higher - position) * col("_v"))
          .when(col("_rn") === higher, (position - lower) * col("_v"))
          .otherwise(lit(0.0)))).as(name)
    }
    base.filter(boundary)
      .groupBy(group).agg(aggs.head, aggs.tail: _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact interpolated percentiles (≡ DuckDB `quantile_cont`: linear
    // interpolation between closest ranks), computed SCALE-SAFELY by
    // [[exactPercentilesByRank]] instead of the built-in `percentile`
    // aggregate whose buffer holds every group value. Two sorted
    // windows (one per value column), boundary-rank selection, a
    // 3-row broadcast join to stitch the columns.
    "q_percentiles" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val qty = exactPercentilesByRank(li, "l_returnflag", "l_quantity",
        Seq(0.25 -> "_q25", 0.5 -> "_q50", 0.75 -> "_q75"))
      val price = exactPercentilesByRank(li, "l_returnflag", "l_extendedprice",
        Seq(0.9 -> "_p90"))
      qty.join(broadcast(price), "l_returnflag")
        .select(col("l_returnflag"),
          round(col("_q25"), 6).as("qty_p25"),
          round(col("_q50"), 6).as("qty_p50"),
          round(col("_q75"), 6).as("qty_p75"),
          round(col("_p90"), 6).as("price_p90"))
        .orderBy("l_returnflag")
    }),

    // Sketch rollup — the pattern that makes digests pay at 100 TB:
    // aggregate once into STORED per-group sketches
    // ([[graft.functions.TDigestSketchAgg]] → binary), answer many
    // later by MERGING the binaries ([[graft.functions.TDigestMergeAgg]])
    // — any quantile over any group-set union without re-reading raw
    // data. Here: per-source doc-length digests (the "daily sketch
    // table" a pipeline persists), merged to global p50/p90, gated
    // against the full corpus's exact ranks. eps = 3/δ: merged
    // pre-clustered centroids can sit anywhere in their span, one
    // extra cap of slack over the direct 2/δ.
    "q_quantile_rollup" -> ((s, d) => {
      val comp = 100
      val docs = Tables.documents(s, d)
        .select(lit("ALL").as("l_returnflag"),
          col("source"), col("n_chars").cast("double").as("l_extendedprice"))
      val perSource = docs.groupBy("source")
        .agg(graft.functions.TDigestSketchAgg(
          col("l_extendedprice"), comp).as("sk"))
      val merged = perSource
        .agg(graft.functions.TDigestMergeAgg(col("sk"), comp, Seq(0.5, 0.9))
          .as("td"))
        .select(lit("ALL").as("rf"),
          element_at(col("td.qs"), 1).as("a50"),
          element_at(col("td.qs"), 2).as("a90"))
      rankGate(docs.select("l_returnflag", "l_extendedprice"), merged, 3.0 / comp)
    }),

    // IQR outlier fence — the robust-statistics cleaning gate a corpus
    // pipeline runs on a quality feature (here: doc length). Per-source
    // exact p25/p75 via the scale-safe rank selection, Tukey fences
    // lo/hi = q25/q75 ∓ 1.5·IQR, then one broadcast join tags each doc.
    // The fences are oracle-checked VALUES (quantile_cont interpolation
    // is bit-identical by the q_percentiles precedent; the ∓1.5·IQR
    // arithmetic is two IEEE ops written identically on both sides),
    // so the outlier COUNTS compare exactly — no tolerance needed.
    // Scale shape: the percentile pass is the q_percentiles machinery
    // (bounded partitions, boundary-rows-only agg); the tagging pass is
    // one scan + a #sources-row broadcast.
    "q_outlier_fence" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("double").as("v"))
      val fences = exactPercentilesByRank(docs, "source", "v",
        Seq(0.25 -> "_q25", 0.75 -> "_q75"))
        .withColumn("lo", col("_q25") - (col("_q75") - col("_q25")) * 1.5)
        .withColumn("hi", col("_q75") + (col("_q75") - col("_q25")) * 1.5)
        .select(col("source"), col("lo"), col("hi"))
      docs.join(broadcast(fences), "source")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("v") < col("lo") || col("v") > col("hi")).cast("long"))
            .as("n_outliers"),
          round(min(col("lo")), 6).as("lo_fence"),
          round(max(col("hi")), 6).as("hi_fence"))
        .orderBy("source")
    }),

    // Winsorized robust mean per source: clip values at the exact
    // per-group p05/p95 (the scale-safe two-phase rank selection) and
    // compare the clipped mean against the raw mean — the robust-
    // statistics normalization a pipeline applies before treating
    // length as a quality signal. Fences broadcast (one row per
    // group); the corpus is scanned once more for the clip+sum. Means
    // are exact-integer micro-unit divisions (DIV), so both engines
    // agree bit-for-bit with no floating-sum order dependence.
    "q_winsorize" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("double").as("v"))
      // Fences rounded to 6dp BEFORE use: 0.05·(n−1) is non-dyadic
      // (unlike the quartile positions), so the two engines' linear
      // interpolations can differ by 1 ulp — unrounded, a fence
      // landing on an integer value flips v < lo between engines.
      val fences = exactPercentilesByRank(docs, "source", "v",
        Seq(0.05 -> "_p05", 0.95 -> "_p95"))
        .select(col("source"), round(col("_p05"), 6).as("lo"),
          round(col("_p95"), 6).as("hi"))
      docs.join(broadcast(fences), "source")
        .withColumn("w_u",
          round(greatest(least(col("v"), col("hi")), col("lo")) * 1e6).cast("long"))
        .withColumn("v_u", round(col("v") * 1e6).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("v") < col("lo") || col("v") > col("hi")).cast("long"))
            .as("n_clipped"),
          expr("CAST(sum(w_u) DIV count(1) AS BIGINT)").as("win_mean_u"),
          expr("CAST(sum(v_u) DIV count(1) AS BIGINT)").as("raw_mean_u"))
        .orderBy("source")
    }),

    // Equi-depth histogram: bucket edges are the exact per-group
    // quartiles (the scale-safe two-phase rank selection), bucket
    // counts come from one more broadcast-join scan — the histogram a
    // profiler pairs with q_column_profile's min/max (equal-WIDTH
    // buckets collapse under skew; equal-DEPTH buckets are the
    // honest shape description). Interpolated edges mean buckets are
    // ~n/4 but not exactly (values tie across edges); the counts
    // REPORT the true shape rather than forcing it.
    "q_histogram_eqdepth" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars").cast("double").as("v"))
      val edges = exactPercentilesByRank(docs, "source", "v",
        Seq(0.25 -> "_q1", 0.5 -> "_q2", 0.75 -> "_q3"))
      docs.join(broadcast(edges), "source")
        .withColumn("bucket",
          when(col("v") <= col("_q1"), 0L)
            .when(col("v") <= col("_q2"), 1L)
            .when(col("v") <= col("_q3"), 2L)
            .otherwise(3L))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("v")), 6).as("lo_v"),
          round(max(col("v")), 6).as("hi_v"))
        .orderBy("source", "bucket")
    }),

    // The sketch percentile: approx_percentile's GK sketch holds
    // bounded state per group — one scan, no sort, where the exact
    // rank form above pays a per-group sort shuffle (both scale; the
    // sketch is the cheaper production default when ±n/acc rank error
    // is acceptable). The approx VALUES are engine-internal (not mirrorable),
    // but the GUARANTEE is: the returned element's rank must sit within
    // ±n/accuracy of the target rank. So the query emits the rank-bound
    // BOOLEANS (plus exact counts) and the oracle emits TRUE — a
    // TOLERANCE SELF-CHECK, not a value mirror (GK internals aren't
    // reproducible in SQL): the DuckDB side only pins that Spark's rank
    // booleans came out true. That the gate can actually FAIL is proven
    // by the negative test in FunctionsSpec, which feeds a poisoned
    // "approx" value through the same rank check and asserts it trips.
    // The rank check itself is one broadcast join + one aggregation, no
    // per-group buffering.
    "q_percentiles_approx" -> ((s, d) => {
      val acc = 1000
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val approx = li.groupBy("l_returnflag")
        .agg(expr(s"approx_percentile(l_extendedprice, array(0.5D, 0.9D), $acc)").as("ap"))
        .select(col("l_returnflag").as("rf"),
          element_at(col("ap"), 1).as("a50"), element_at(col("ap"), 2).as("a90"))
      rankGate(li, approx, 1.0 / acc)
    }),

    // The THIRD quantile form: the custom t-digest sketch
    // ([[graft.functions.TDigestAgg]]) — mergeable without compounding
    // error (what a 1000-executor partial-merge tree needs; GK merges
    // degrade) and able to answer any quantile post-hoc from ~2δ
    // centroids. Like q_percentiles_approx, the VALUES are order-
    // dependent sketch internals, so the query emits the rank-bound
    // GUARANTEE through the same rankGate (eps = 2/δ — the uniform k0
    // cluster cap n/δ plus interpolation slack); the gate's
    // falsifiability is proven by FunctionsSpec's poisoned negative.
    "q_percentiles_tdigest" -> ((s, d) => {
      val comp = 100
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
      val dig = li.groupBy("l_returnflag")
        .agg(graft.functions.TDigestAgg(
          col("l_extendedprice").cast("double"), comp, Seq(0.5, 0.9)).as("td"))
        .select(col("l_returnflag").as("rf"),
          element_at(col("td.qs"), 1).as("a50"),
          element_at(col("td.qs"), 2).as("a90"))
      rankGate(li, dig, 2.0 / comp)
    }),

    "q_string_funcs" -> ((s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_type"), 1, 6).as("type6"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_brand"), "Brand", "B").as("brand_short"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        reverse(col("p_name")).as("rname"),
        instr(col("p_name"), "e").cast("long").as("pos_e"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"))
        .orderBy("p_partkey")),

    "q_date_funcs" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        col("o_orderdate").cast("date").as("ord_date"))
        .orderBy("o_orderkey")),

    "q_math_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") - 50000.0), 2).as("abs_diff"),
          floor(col("l_quantity")).as("floor_q"),
          ceil(col("l_quantity")).as("ceil_q"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(exp(col("l_discount")), 6).as("exp_d"),
          round(pow(col("l_quantity"), 2.0), 2).as("pow_q"),
          (col("l_orderkey") % 7).as("mod_k"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("le"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Map-function surface (§2.8): a per-order linenumber→quantity map
    // built with map_from_entries over SORTED entries (collect_list
    // order is partitioning-dependent; the sort restores determinism),
    // then the lookup/keys/higher-order-filter/fold surface over it.
    // The synthetic lineitem repeats (orderkey, linenumber), and
    // map_from_entries REJECTS duplicate keys (Spark's default
    // EXCEPTION dedup policy — the safe one), so quantities aggregate
    // per line first. The oracle mirrors the VALUES relationally —
    // DuckDB's MAP type need not round-trip through parquet for the
    // compare. Quantities are whole-number doubles, so every sum here
    // is exact under any association order.
    "q_map_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        // ONE exchange for both aggregations (guide §2.4): hash on
        // l_orderkey alone satisfies the (l_orderkey, k) clustering of
        // the inner aggregate AND the outer groupBy's, so the per-line
        // dedup and the map build run in the same stage. The (okey,
        // line) keys are near-unique, so the map-side partial agg this
        // trades away was not reducing the shuffle anyway.
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_linenumber").cast("long").as("k"))
        .agg(sum(col("l_quantity")).as("v"))
        .groupBy("l_orderkey")
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("k"), col("v"))))).as("m"))
        .select(col("l_orderkey"),
          size(col("m")).cast("long").as("n_lines"),
          element_at(col("m"), lit(1L)).as("qty_line1"),
          concat_ws(",", transform(map_keys(col("m")), _.cast("string")))
            .as("keys_csv"),
          size(map_filter(col("m"), (_, v) => v > 25)).cast("long").as("n_heavy"),
          round(aggregate(map_values(col("m")), lit(0.0), (a, v) => a + v), 6)
            .as("qty_total"))
        .orderBy("l_orderkey")),

    "q_case_null" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", "finished")
          .when(col("o_orderstatus") === "O", "open")
          .otherwise("other").as("status_label"),
        coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("urgent"))
          .as("prio"),
        when(col("o_totalprice") >= 250000, "big")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("small").as("size_class"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"))
        .orderBy("o_orderkey"))
  )

  def oracle: Map[String, String] = Map(
    "q_percentiles_approx" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        | true AS p50_rank_ok, true AS p90_rank_ok
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),

    "q_percentiles_tdigest" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        | true AS p50_rank_ok, true AS p90_rank_ok
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),

    "q_quantile_rollup" ->
      """SELECT 'ALL' AS l_returnflag, count(*)::BIGINT AS n,
        | true AS p50_rank_ok, true AS p90_rank_ok
        | FROM documents""".stripMargin.replace("\n", ""),

    "q_outlier_fence" ->
      """WITH f AS (SELECT source,
        |   quantile_cont(n_chars::DOUBLE, 0.25) AS q25,
        |   quantile_cont(n_chars::DOUBLE, 0.75) AS q75
        |   FROM documents GROUP BY source),
        | ff AS (SELECT source, q25 - (q75 - q25) * 1.5 AS lo,
        |   q75 + (q75 - q25) * 1.5 AS hi FROM f)
        |SELECT d.source, count(*)::BIGINT AS n_docs,
        | sum(CASE WHEN d.n_chars::DOUBLE < lo OR d.n_chars::DOUBLE > hi
        |   THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        | round(min(lo), 6) AS lo_fence, round(max(hi), 6) AS hi_fence
        | FROM documents d JOIN ff USING (source)
        | GROUP BY d.source ORDER BY d.source"""
        .stripMargin.replace("\n", ""),

    "q_histogram_eqdepth" ->
      """WITH d AS (SELECT source, n_chars::DOUBLE AS v FROM documents),
        | e AS (SELECT source,
        |   quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS q2,
        |   quantile_cont(v, 0.75) AS q3
        |   FROM d GROUP BY source),
        | b AS (SELECT d.source, v,
        |   CASE WHEN v <= q1 THEN 0 WHEN v <= q2 THEN 1
        |        WHEN v <= q3 THEN 2 ELSE 3 END::BIGINT AS bucket
        |  FROM d JOIN e USING (source))
        |SELECT source, bucket, count(*)::BIGINT AS n_docs,
        | round(min(v), 6) AS lo_v, round(max(v), 6) AS hi_v
        | FROM b GROUP BY source, bucket ORDER BY source, bucket"""
        .stripMargin.replace("\n", ""),

    "q_winsorize" ->
      """WITH d AS (SELECT source, n_chars::DOUBLE AS v FROM documents),
        | f AS (SELECT source,
        |   round(quantile_cont(v, 0.05), 6) AS lo,
        |   round(quantile_cont(v, 0.95), 6) AS hi
        |   FROM d GROUP BY source),
        | j AS (SELECT d.source, v, lo, hi,
        |   round(greatest(least(v, hi), lo) * 1e6)::BIGINT AS w_u,
        |   round(v * 1e6)::BIGINT AS v_u
        |  FROM d JOIN f USING (source))
        |SELECT source, count(*)::BIGINT AS n_docs,
        | sum(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END)::BIGINT
        |   AS n_clipped,
        | (sum(w_u) // count(*))::BIGINT AS win_mean_u,
        | (sum(v_u) // count(*))::BIGINT AS raw_mean_u
        | FROM j GROUP BY source ORDER BY source"""
        .stripMargin.replace("\n", ""),

    "q_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
        | round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
        | round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
        | round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", ""),
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        | substr(p_type, 1, 6) AS type6,
        | length(p_name) AS name_len,
        | regexp_replace(p_brand, 'Brand', 'B', 'g') AS brand_short,
        | concat(p_brand, ':', p_type) AS brand_type,
        | lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        | reverse(p_name) AS rname,
        | strpos(p_name, 'e') AS pos_e,
        | split_part(p_name, ' ', 1) AS first_word
        | FROM part ORDER BY p_partkey""".stripMargin.replace("\n", ""),
    "q_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mon,
        | CAST(day(o_orderdate) AS BIGINT) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | last_day(o_orderdate) AS month_end,
        | CAST(o_orderdate AS DATE) AS ord_date
        | FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", ""),
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(abs(l_extendedprice - 50000.0), 2) AS abs_diff,
        | CAST(floor(l_quantity) AS BIGINT) AS floor_q,
        | CAST(ceil(l_quantity) AS BIGINT) AS ceil_q,
        | round(sqrt(l_extendedprice), 6) AS sqrt_p,
        | round(ln(l_extendedprice), 6) AS ln_p,
        | round(exp(l_discount), 6) AS exp_d,
        | round(pow(l_quantity, 2.0), 2) AS pow_q,
        | l_orderkey % 7 AS mod_k,
        | greatest(l_tax, l_discount) AS gr,
        | least(l_tax, l_discount) AS le
        | FROM lineitem WHERE l_orderkey <= 200
        | ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("\n", ""),
    "q_map_funcs" ->
      """WITH e AS (SELECT l_orderkey, l_linenumber::BIGINT AS k,
        |   sum(l_quantity) AS v FROM lineitem GROUP BY 1, 2)
        |SELECT l_orderkey, count(*)::BIGINT AS n_lines,
        | max(CASE WHEN k = 1 THEN v END) AS qty_line1,
        | array_to_string(list_transform(list_sort(list(k)),
        |   x -> x::VARCHAR), ',') AS keys_csv,
        | count(CASE WHEN v > 25 THEN 1 END)::BIGINT AS n_heavy,
        | round(sum(v), 6) AS qty_total
        | FROM e GROUP BY l_orderkey
        | ORDER BY l_orderkey""".stripMargin.replace("\n", ""),
    "q_case_null" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus = 'F' THEN 'finished'
        |      WHEN o_orderstatus = 'O' THEN 'open'
        |      ELSE 'other' END AS status_label,
        | coalesce(nullif(o_orderpriority, '1-URGENT'), 'urgent') AS prio,
        | CASE WHEN o_totalprice >= 250000 THEN 'big'
        |      WHEN o_totalprice >= 100000 THEN 'mid'
        |      ELSE 'small' END AS size_class,
        | nullif(o_orderstatus, 'P') AS status_or_null
        | FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", "")
  )
}
