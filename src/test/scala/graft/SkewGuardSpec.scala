package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, SkewGuard}

/** Planted heavy-bucket tests for the LSH bucket-size cap: a degenerate
  * bucket holding most of the corpus must split into bounded sub-buckets
  * so candidate-pair enumeration stays O(n·cap) instead of O(n²). */
class SkewGuardSpec extends AnyFunSuite with SparkSpec {

  test("planted heavy bucket: sub-bucket sizes and pair counts are bounded") {
    val s = spark
    import s.implicits._
    val cap = 50
    // 4000 members in one hot bucket + 10 light buckets of 20.
    val rows = (1 to 4000).map(i => (i.toLong, "hot")) ++
      (1 to 200).map(i => (10000L + i, s"light${i % 10}"))
    val df = rows.toDF("id", "bucket").repartition(8)
    val capped = SkewGuard.capBuckets(df, "bucket", col("id"), cap)

    val sizes = capped.groupBy("bucket").agg(count(lit(1)).as("sz"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // Hot bucket split into ceil(4000/50)=80 salts; hash-uniform sizes
    // concentrate near 50 — assert a generous 3x bound, and that the
    // split actually happened.
    val hot = sizes.filter(_._1.startsWith("hot:"))
    assert(hot.length == 80, s"expected 80 hot sub-buckets, got ${hot.length}")
    assert(hot.map(_._2).max <= 3L * cap)
    // Light buckets stay intact (single salt 0).
    val light = sizes.filter(_._1.startsWith("light"))
    assert(light.length == 10 && light.forall(_._2 == 20L))
    assert(light.forall(_._1.endsWith(":0")))

    // Candidate volume: Σ sz² ≈ n·cap instead of n².
    val pairSum = sizes.map { case (_, sz) => sz * sz }.sum
    assert(pairSum < 3L * 4200 * cap,
      s"pair enumeration $pairSum not linear-bounded")
  }

  test("pair recall lost to sub-bucket splitting is ~1/nsplit on an over-cap bucket") {
    val s = spark
    import s.implicits._
    val cap = 64
    val n = 256 // one hot bucket -> ceil(256/64) = 4 sub-buckets
    val df = (1 to n).map(i => (i.toLong, "hot")).toDF("id", "bucket")
    val capped = SkewGuard.capBuckets(df, "bucket", col("id"), cap)
    val sizes = capped.groupBy("bucket").count().collect().map(_.getLong(1))
    assert(sizes.length == 4)
    // A within-bucket pair survives capping iff both members hash into
    // the same sub-bucket: expected recall for an s-way uniform split
    // is 1/s. Deterministic (content-independent hash), so the exact
    // number is stable; assert it near the 1/4 expectation. The
    // remaining 3/4 is the documented cap trade: an over-cap bucket is
    // near-degenerate for similarity, and production re-bands overflow
    // with more planes rather than enumerating its pairs (SkewGuard
    // scaladoc; multi-probe restores recall from the PROBE side).
    val kept = sizes.map(sz => sz * (sz - 1) / 2).sum
    val total = n.toLong * (n - 1) / 2
    val recall = kept.toDouble / total
    info(f"pair recall after 4-way split: $recall%.4f (expected ~0.25)")
    assert(math.abs(recall - 0.25) < 0.05, s"pair recall $recall not ~1/4")
  }

  test("cap assignment is deterministic and partitioning-invariant") {
    val s = spark
    import s.implicits._
    val rows = (1 to 1000).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
    def run(parts: Int) =
      SkewGuard.capBuckets(rows.toDF("id", "bucket").repartition(parts),
        "bucket", col("id"), 10)
        .select("id", "bucket")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(1) == run(17))
  }

  test("SkewAdvise recommendation drives saltedPostings on planted skew") {
    val s = spark
    import s.implicits._
    // Planted hot key: "zebra" holds 3000 of 3300 pairs (the reference's
    // own heavy-key experiment shape); 300 rows spread over 100 cool
    // words. SpaceSaving at capacity 64 > 101 distinct keys is EXACT,
    // so the advice is ceil(share × shuffle partitions) with no
    // estimation slack.
    val rows = (1 to 3000).map(i => ("zebra", i.toLong)) ++
      (1 to 300).map(i => (s"w${i % 100}", 100000L + i))
    val pairs = rows.toDF("word", "doc_id").repartition(8)
    val nPart = s.sessionState.conf.numShufflePartitions
    val expected = math.max(1, math.ceil(3000.0 / 3300 * nPart).toInt)

    val advised = graft.SkewAdvise.recommend(pairs, col("word"), capacity = 128)
    assert(advised == expected,
      s"advice $advised != ceil(share*nPart) = $expected")
    assert(advised > 1, "planted skew must advise a real split")

    // The advised plan: same result as the plain single-phase postings,
    // with the salt fan-out the profile chose.
    val (salted, used) = InvertedIndex.saltedPostingsAdvised(
      pairs, col("word"), col("doc_id"), capacity = 128)
    assert(used == advised, s"salted plan used $used salts, advice was $advised")
    val got = salted.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = InvertedIndex.postings(pairs, col("word"), col("doc_id"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == want, "advised salted postings diverge from plain postings")

    // And an UNSKEWED input advises no salting: the pre-flight doesn't
    // pay the two-phase tax when the hash shuffle already balances.
    val flat = (1 to 2000).map(i => (s"w${i % 1000}", i.toLong))
      .toDF("word", "doc_id")
    assert(graft.SkewAdvise.recommend(flat, col("word"), 2048) == 1)
  }

  test("capBuckets is a pure column rewrite: null-bucket rows survive") {
    val s = spark
    import s.implicits._
    // A plain using-join would silently DROP the null-bucket group
    // (null != null in an equi-join) — the cap must pass it through
    // like any other bucket.
    val df = Seq((Some("b1"), 1L), (Some("b1"), 2L), (None, 3L), (None, 4L))
      .toDF("bucket", "id")
    val capped = SkewGuard.capBuckets(df, "bucket", col("id"), cap = 2)
    assert(capped.count() == 4, "row count must be preserved")
    val nullRows = capped.filter(col("bucket").startsWith("null:") ||
      col("bucket").isNull).count()
    assert(nullRows == 2, s"null-bucket rows lost: ${capped.collect().toSeq}")
  }
}
