package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic bucket-size cap for LSH-style candidate generation.
  *
  * Every bucketed near-dup/ANN pipeline enumerates pairs WITHIN buckets,
  * so its cost is Σ_b |b|² — linear while buckets stay bounded, but
  * quadratic in the skewiest bucket: at 100× data a popular LSH bucket
  * grows 100× and its pair count 10,000×. [[capBuckets]] bounds that:
  * buckets larger than `cap` are split into ceil(size/cap) sub-buckets
  * by a content-independent hash of the member id, so
  *
  *  - expected sub-bucket size ≤ cap (each member lands uniformly in
  *    one of the splits), making candidate enumeration O(n·cap) total;
  *  - the split is a pure function of (bucket sizes, member ids) — no
  *    randomness, no partitioning dependence — so results are
  *    reproducible and the DuckDB oracle mirrors them exactly
  *    ([[graft.queries.OracleSql.cappedBucket]]);
  *  - recall loss is confined to over-cap buckets (pairs split across
  *    sub-buckets), the standard LSH cap-and-refine trade: a heavy
  *    bucket is near-degenerate for similarity anyway (everything
  *    collides), and a production pipeline re-bands overflow with more
  *    planes rather than enumerating b² pairs.
  *
  * Shape: one groupBy on the bucket key (map-side partial counts → one
  * row per bucket) joined back — equi-join, AQE-skew-splittable — then
  * a projection. No windows over the heavy bucket (a window would sort
  * the whole bucket in one task, re-creating the skew being guarded).
  */
object SkewGuard {

  /** Replace `bucketCol` with a capped sub-bucket key (STRING
    * `"<bucket>:<salt>"`). Buckets of size ≤ cap keep salt 0 (key
    * `"b:0"`), so sub-cap behavior is identical modulo the rename.
    *
    * `broadcastSizes = true` (the default) is for design-bounded bucket
    * domains (2^planes, 2×2^16, …) where the one-row-per-bucket size
    * table is provably tiny; pass `false` for UNBOUNDED key domains
    * (e.g. sampled shingle hashes) — the sizes join is then a plain
    * equi-join AQE can plan either way. */
  def capBuckets(df: DataFrame, bucketCol: String, idCol: Column, cap: Int,
      broadcastSizes: Boolean = true): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val sizes = df.groupBy(col(bucketCol)).agg(count(lit(1)).as("_bsz"))
    // Null-SAFE join on the bucket key: the contract is a pure column
    // rewrite, so a null bucket (e.g. the hash of a null id) must pass
    // through capped like any other group — a plain using-join would
    // silently DROP those rows (null != null in an equi-join).
    val sizesR = (if (broadcastSizes) broadcast(sizes) else sizes)
      .withColumnRenamed(bucketCol, "_bkey")
    df.join(sizesR, df(bucketCol) <=> sizesR("_bkey")).drop("_bkey")
      .withColumn("_nsplit", ceil(col("_bsz") / lit(cap.toDouble)).cast("long"))
      .withColumn(bucketCol,
        concat(col(bucketCol).cast("string"), lit(":"),
          pmod(TextFunctions.hash60(concat(lit("split:"), idCol.cast("string"))),
            col("_nsplit")).cast("string")))
      .drop("_bsz", "_nsplit")
  }
}
