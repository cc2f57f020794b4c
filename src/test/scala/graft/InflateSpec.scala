package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFunctions, VectorFunctions}

/** Pins the linearity invariants of the [[Inflate]] scaling harness.
  *
  * The measured scaling curve (PLANS.md) is evidence ONLY while the
  * inflated data actually grows linearly in every dimension the engine
  * is sensitive to. That is not hypothetical: a marker-rendering bug in
  * the first generator cut (double-division markers emitting "r1p3.0",
  * tokenized into a universal "0" token) silently rebuilt giant shingle
  * groups — 123M candidate pairs, max group 1584 vs the base's 23 —
  * and made a linear engine look quadratic. This spec makes that class
  * of generator regression fail HERE, loudly, instead of invalidating
  * the next round's scaling measurement.
  */
class InflateSpec extends AnyFunSuite with SparkSpec {

  private val in = "/root/testdata/sf0.001"
  private val factor = 3

  // One inflation per suite; every test reads from it.
  private lazy val out: String = {
    val d = Files.createTempDirectory("graft-inflate").resolve("x3").toString
    Inflate.run(spark, in, d, factor)
    d
  }

  private def tbl(root: String, t: String): DataFrame =
    spark.read.parquet(s"$root/$t.parquet")

  /** Engine-exact shingle table (the dedup family's phase 1): doc_id →
    * distinct hashed 3-shingles. */
  private def shingles(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(col("doc_id"),
      explode(TextFunctions.hashedShingleSet(col("toks"), 3)).as("sh"))

  test("fact tables grow exactly ×factor; dimension tables stay fixed") {
    for (t <- Seq("documents", "lineitem", "orders", "customer", "part",
        "supplier", "events", "embeddings"))
      assert(tbl(out, t).count() == factor * tbl(in, t).count(), s"$t not ×$factor")
    for (t <- Seq("nation", "region"))
      assert(tbl(out, t).count() == tbl(in, t).count(), s"dim $t must not inflate")
  }

  test("join fan-out: per-key group-size HISTOGRAMS replicate, never deepen") {
    // A join/group-by scales linearly only if per-key group sizes stay
    // those of the base corpus — the histogram of (group size → #keys)
    // must be the base histogram with every count ×factor.
    def hist(df: DataFrame, key: String): Map[Long, Long] = df
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist(tbl(out, "lineitem"), "l_orderkey") ==
      hist(tbl(in, "lineitem"), "l_orderkey").view.mapValues(_ * factor).toMap,
      "lineitem per-orderkey histogram not an exact ×factor replica")
    assert(hist(tbl(out, "events"), "user_id") ==
      hist(tbl(in, "events"), "user_id").view.mapValues(_ * factor).toMap,
      "events per-user histogram not an exact ×factor replica")
  }

  test("shingle keys never collide across replicas and groups never deepen") {
    val docStride = tbl(in, "documents").agg(max(col("doc_id"))).head().getLong(0) + 1
    val baseGroups = shingles(tbl(in, "documents"))
      .groupBy("sh").agg(count(lit(1)).as("n"))
    val inflGroups = shingles(tbl(out, "documents"))
      .withColumn("replica", (col("doc_id") / docStride).cast("long"))
      .groupBy("sh").agg(count(lit(1)).as("n"),
        countDistinct(col("replica")).as("reps"))
    // The position-tagged markers exist precisely so no 3-token window
    // of replica k equals any window of replica j — a cross-replica
    // shingle group is the exact signature of the "universal token" bug.
    assert(inflGroups.filter(col("reps") > 1).count() == 0,
      "shingle groups span replicas: cross-replica dup families will explode candidates")
    val baseMax = baseGroups.agg(max(col("n"))).head().getLong(0)
    val inflMax = inflGroups.agg(max(col("n"))).head().getLong(0)
    // Markers shift window contents, so per-replica sizes aren't
    // bit-equal to base — but a same-order bound separates that from
    // the bug's 69× blow-up.
    assert(inflMax <= 2 * baseMax,
      s"max shingle group deepened: $inflMax vs base $baseMax")
    // Candidate-pair mass (Σ C(n,2) over groups) must stay linear in
    // factor: replica 0 alone contributes exactly the base mass.
    def pairMass(g: DataFrame): Long =
      g.agg(sum(col("n") * (col("n") - 1)).cast("long")).head().getLong(0) / 2
    val basePairs = pairMass(baseGroups)
    val inflPairs = pairMass(inflGroups.select(col("sh"), col("n")))
    assert(inflPairs >= basePairs, "replica 0 must contribute the base pair mass")
    assert(inflPairs <= 2L * factor * basePairs,
      s"candidate pairs super-linear: $inflPairs vs ${factor}× base $basePairs")
  }

  test("embedding replicas are isometric within and scattered across") {
    val vecStride = tbl(in, "embeddings").agg(max(col("vec_id"))).head().getLong(0) + 1
    val base = tbl(in, "embeddings")
      .select(col("vec_id"), col("embedding").as("vb"))
    val rep1 = tbl(out, "embeddings")
      .filter(col("vec_id") >= vecStride && col("vec_id") < 2 * vecStride)
      .select((col("vec_id") - vecStride).as("vec_id"), col("embedding").as("vr"))
    val joined = base.join(rep1, "vec_id")
      .select(
        VectorFunctions.l2Norm(col("vb")).as("nb"),
        VectorFunctions.l2Norm(col("vr")).as("nr"),
        (VectorFunctions.dot(col("vb"), col("vr"))
          / (VectorFunctions.l2Norm(col("vb"))
             * VectorFunctions.l2Norm(col("vr")))).as("cos"))
    val r = joined.agg(max(abs(col("nb") - col("nr"))).as("dn"),
      max(abs(col("cos"))).as("maxcos")).head()
    // Sign flip is an isometry: norms preserved exactly (same squares
    // summed — float addition order unchanged by elementwise negate).
    assert(r.getDouble(0) == 0.0, s"replica changed norms by ${r.getDouble(0)}")
    // Cross-replica cosines must scatter away from ±1: an additive-
    // jitter style generator bug makes every replica a near-dup of its
    // base (cos ≈ 1) and near-dup output quadratic in factor.
    assert(r.getDouble(1) < 0.9, s"replica near-dups its base: max |cos| ${r.getDouble(1)}")
  }
}
