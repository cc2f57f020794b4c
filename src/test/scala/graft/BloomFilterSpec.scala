package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BloomBuildAgg, BloomImpl, BloomMightContain}

/** The Bloom runtime-filter contract: no false negatives ever, false
  * positives bounded near the designed rate, distributed (partial +
  * merge) build ≡ single-pass build, and the q_bloom_join pre-filter
  * measurably shrinks the fact side before the join shuffle. */
class BloomFilterSpec extends AnyFunSuite with SparkSpec {

  private val n = 5000
  private val keys: Seq[Long] = (0 until n).map(i => BloomImpl.fmix64(i.toLong * 7 + 3))

  test("pure impl: zero false negatives, fpp within 2x of design") {
    val bits = BloomImpl.optimalNumBits(n, 0.01)
    val m = ((bits + 63) >>> 6) << 6
    val k = BloomImpl.optimalNumHashes(m, n)
    val words = new Array[Long](BloomImpl.numWords(m))
    keys.foreach(BloomImpl.add(words, k, _))
    val ser = BloomImpl.serialize(words, k)
    keys.foreach(key => assert(BloomImpl.mightContain(ser, key),
      s"false negative for inserted key $key"))
    val absent = (0 until 20000).map(i => BloomImpl.fmix64(-1L - i * 13))
      .filterNot(keys.toSet)
    val fp = absent.count(BloomImpl.mightContain(ser, _))
    val rate = fp.toDouble / absent.size
    assert(rate < 0.02, f"false-positive rate $rate%.4f exceeds 2x the 1%% design")
    // And the filter genuinely rejects: far below always-true.
    assert(rate < 0.5)
  }

  test("merge of partial filters equals single-pass build (OR associativity)") {
    val m = 1024
    val k = 5
    val (a, b) = keys.splitAt(n / 3)
    val whole = new Array[Long](BloomImpl.numWords(m))
    keys.foreach(BloomImpl.add(whole, k, _))
    val pa = new Array[Long](BloomImpl.numWords(m))
    a.foreach(BloomImpl.add(pa, k, _))
    val pb = new Array[Long](BloomImpl.numWords(m))
    b.foreach(BloomImpl.add(pb, k, _))
    val merged = pa.zip(pb).map { case (x, y) => x | y }
    assert(merged.sameElements(whole))
  }

  test("aggregate + probe expression round-trip on a DataFrame") {
    val s = spark
    import s.implicits._
    val present = (1L to 400L).map(_ * 3)
    val df = present.toDF("key")
    val bloom = df.agg(BloomBuildAgg(col("key"), 1000L, 0.01).as("bf"))
    val probes = (1L to 1200L).toDF("p")
    val got = probes.crossJoin(broadcast(bloom))
      .select(col("p"), BloomMightContain(col("bf"), col("p")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    present.foreach(key => assert(got(key), s"false negative for $key"))
    val absentHits = (1L to 1200L).filter(_ % 3 != 0).count(got(_))
    assert(absentHits < 80, s"$absentHits false positives out of 800 absent keys")
  }

  test("probe agrees between codegen and interpreted eval") {
    val bits = 512
    val k = 4
    val words = new Array[Long](BloomImpl.numWords(bits))
    (1L to 50L).foreach(BloomImpl.add(words, k, _))
    val ser = BloomImpl.serialize(words, k)
    val s = spark
    import s.implicits._
    val df = (1L to 200L).toDF("p")
    val probe = BloomMightContain(lit(ser), col("p"))
    val viaPlan = df.select(col("p"), probe.as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (1L to 200L).foreach { key =>
      assert(viaPlan(key) == BloomImpl.mightContain(ser, key),
        s"codegen/interpreted mismatch at $key")
    }
  }

  test("q_bloom_join pre-filter shrinks the fact side ahead of the shuffle") {
    val d = "/root/testdata/sf0.001"
    val dim = graft.sources.Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bloom = dim.agg(BloomBuildAgg(col("o_orderkey"), 16384L, 0.01).as("bf"))
    val fact = graft.sources.Tables.lineitem(spark, d).select("l_orderkey")
    val total = fact.count()
    val kept = fact.crossJoin(broadcast(bloom))
      .where(BloomMightContain(col("bf"), col("l_orderkey"))).count()
    val trueMatches = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= trueMatches, "pre-filter must never drop a matching row")
    // Urgent orders are ~1/5 of orders; the filter must strip most of
    // the rest (false positives allowed, wholesale passthrough not).
    assert(kept < total * 0.5,
      s"pre-filter kept $kept of $total rows - not selective")
    // And the full query's result equals the plain join (the oracle
    // gate re-checks this cross-engine at sf0.01).
    val viaBloom = graft.SparkEntry.queries("q_bloom_join")(spark, d).collect()
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBloom.map(_.getLong(1)).sum == plain)
  }

  test("q_dedup_incremental equals the plain anti join; negatives bypass it") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
    val fp = graft.functions.TextFunctions.hash60(col("text"))
    val hist = docs.filter(col("doc_id") % 5 =!= 0).select(fp.as("fp"))
    val incoming = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), fp.as("fp"))
    val plainAnti = incoming.join(hist, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaBloom = graft.SparkEntry.queries("q_dedup_incremental")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == plainAnti)
    // The filter's no-false-negative side lets bloom-negative rows skip
    // the anti join; with distinct per-doc content hashes the suspect
    // set must be far smaller than the batch (≈ true dups + fpp).
    import org.apache.spark.sql.graftbridge.Bridge
    val bloom = Bridge.scalarSubquery(
      hist.agg(graft.functions.BloomBuildAgg(col("fp"), 65536L, 0.01).as("bf")))
    val nIncoming = incoming.count()
    val nSuspects = incoming
      .where(graft.functions.BloomMightContain(bloom, col("fp"))).count()
    assert(nSuspects < nIncoming,
      s"bloom screened nothing: $nSuspects of $nIncoming flagged")
  }
}
