package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Pins the weighted-sampling band (q_sample_weighted /
  * q_token_budget): the Efraimidis–Spirakis key against a plain-JVM
  * model, the selection bias the weighting exists to produce, and the
  * partition-count independence the two-phase running sum claims.
  */
class SamplingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Plain-JVM model of [[CorpusQueries.esKey]]: same md5-derived
    * uniform, same fold order, same HALF_UP 6dp rounding. */
  private def modelKey(id: Long, weight: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"wsample:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    val u = (h + 1).toDouble / 1152921504606846976.0
    val raw = -math.log(u) / math.max(weight, 1L).toDouble * 1e6
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("esKey matches the plain-JVM model bit-for-bit") {
    val s = spark; import s.implicits._
    val rows = (1L to 200L).map(i => (i, 1L + (i % 97) * 13))
    val got = rows.toDF("id", "w")
      .select(col("id"), col("w"),
        CorpusQueries.esKey(col("id"), col("w")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.foreach { case (i, w) =>
      assert(got((i, w)) == modelKey(i, w), s"id=$i w=$w")
    }
  }

  test("heavier rows dominate the weighted sample") {
    val s = spark; import s.implicits._
    // 1000 heavy (w=5000) + 1000 light (w=50): the pairwise inclusion
    // odds are 100:1, so a 100-row sample is expected ~99% heavy
    // (an unweighted sampler would draw ~50/50 — many sigma away).
    val rows = (1L to 2000L).map(i => (i, if (i <= 1000) 5000L else 50L))
    val top = rows.toDF("id", "w")
      .withColumn("k", CorpusQueries.esKey(col("id"), col("w")))
      .orderBy("k").limit(100).collect()
    val heavy = top.count(_.getLong(1) == 5000L)
    assert(heavy >= 90, s"heavy=$heavy of 100 — weighting not applied")
  }

  test("q_token_budget is invariant to shuffle-partition count") {
    val q = SparkEntry.queries("q_token_budget")
    def run() = q(spark, sf).collect().map(_.toSeq).toSeq
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.shuffle.partitions", "3")
      val a = run()
      conf.set("spark.sql.shuffle.partitions", "11")
      val b = run()
      assert(a.nonEmpty, "empty selection — budget never engaged")
      assert(a == b, "selection depends on partitioning")
    } finally conf.set("spark.sql.shuffle.partitions", orig)
  }

  test("q_mix_manifest never overfills a source quota or the total") {
    val rows = SparkEntry.queries("q_mix_manifest")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Per-source picks ≤ quota (a source smaller than its quota yields
    // what it has — sf0.001 sources hold 2-3 docs), and the whole mix
    // stays under the requested k. Exact quota arithmetic is pinned by
    // the sf0.01 oracle (117 = 7×10 + 7×5 + 6×2 rows).
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length <= rs.head.getLong(2), s"$src overfilled")
      assert(rs.map(_.getInt(4)).sorted.toSeq == (1 to rs.length),
        s"$src ranks not contiguous")
    }
    assert(rows.length <= 120)
  }

  test("q_token_budget keeps a gapless prefix under the budget") {
    val rows = SparkEntry.queries("q_token_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Every kept row is under budget, and the kept set is a contiguous
    // prefix of the ekey stream: each row's cum_before is the previous
    // row's cum_before plus its token count (no gaps, no reorder).
    assert(rows.forall(_.getLong(4) < 12000L))
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(1).getLong(4) == w(0).getLong(4) + w(0).getLong(2),
          s"gap between ${w(0)} and ${w(1)}")
    }
  }
}
