package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingKernels

/** Structured-Streaming kernel tests over MemoryStream sources: the
  * batch transform graphs run incrementally and agree with their batch
  * twins; watermarks emit closed windows. */
class StreamingSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming word count agrees with the batch kernel (complete mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val q = StreamingKernels.wordCount(source.toDF())
      .writeStream.format("memory").queryName("wc_stream")
      .outputMode("complete").start()
    try {
      source.addData("the quick fox", "the dog")
      q.processAllAvailable()
      val got = spark.table("wc_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("the" -> 2L, "quick" -> 1L, "fox" -> 1L, "dog" -> 1L))

      // Incremental update: new batch revises existing keys.
      source.addData("the fox jumps")
      q.processAllAvailable()
      val got2 = spark.table("wc_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got2("the") == 3L && got2("jumps") == 1L)
    } finally q.stop()
  }

  test("streaming inverted index builds the reference fixture incrementally") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val q = StreamingKernels.invertedIndex(source.toDF())
      .writeStream.format("memory").queryName("idx_stream")
      .outputMode("complete").start()
    try {
      source.addData((1 to 3).map(i => s"apple\tdoc$i"): _*)
      source.addData("apple\tdoc1", "zebra\tdoc6", "notab", "")
      q.processAllAvailable()
      val got = spark.table("idx_stream").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == Map("apple" -> "doc1,doc2,doc3", "zebra" -> "doc6"))
    } finally q.stop()
  }

  test("streaming chunker emits the batch chunk manifest exactly once per doc") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, ts("2026-01-01 10:00:00"), ("tok " * 100).trim), // 100 tokens → 3 chunks
      (2L, ts("2026-01-01 10:01:00"), "alpha beta gamma"),  // 3 tokens  → 1 chunk
      (3L, ts("2026-01-01 10:02:00"), ("word " * 64).trim)) // 64 tokens → 2 chunks
    val source = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingKernels.chunkDocs(
        source.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try {
      // Two micro-batches: stateless op must emit each doc's manifest
      // exactly once, in whichever batch the doc arrived.
      source.addData(docs.take(2): _*)
      q.processAllAvailable()
      source.addData(docs.drop(2): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("chunk_idx"))) ->
          (r.getLong(r.fieldIndex("start_tok")), r.getLong(r.fieldIndex("chunk_tokens")),
            r.getString(r.fieldIndex("chunk_fp")))
      val got = spark.table("chunk_stream").collect().map(key).toMap
      val batch = graft.operators.Chunker.manifest(
          docs.toDF("doc_id", "ts", "text")).collect().map(key).toMap
      assert(spark.table("chunk_stream").count() == batch.size) // no dup emission
      assert(got == batch)
      assert(got.keySet.map(_._1) == Set(1L, 2L, 3L))
      assert(got.count(_._1._1 == 1L) == 3) // ceil((100-16)/48) chunks at 64/48
    } finally q.stop()
  }

  test("stateless bigram scorer matches the batch LM query bit-for-bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // TRAIN batch-side (bounded model, collected once), SCORE streaming.
    val (vocab, nllU) = graft.queries.CorpusQueries.trainedBigramModel(spark, sf)
    assert(vocab.size == 16 && nllU.size == 17 * 17)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), ts("2026-01-01 10:00:00"), r.getString(1)))
    val source = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingKernels.bigramScore(
        source.toDF().toDF("doc_id", "ts", "text"), vocab, nllU)
      .writeStream.format("memory").queryName("bigram_stream")
      .outputMode("append").start()
    try {
      // Two micro-batches; the stateless scorer emits each doc once.
      source.addData(docs.take(200): _*)
      q.processAllAvailable()
      source.addData(docs.drop(200): _*)
      q.processAllAvailable()
      val got = spark.table("bigram_stream").collect()
        .map(r => r.getLong(r.fieldIndex("doc_id")) ->
          ((r.getLong(r.fieldIndex("n_bigrams")),
            r.getLong(r.fieldIndex("nll_sum_u")),
            r.getLong(r.fieldIndex("avg_nll_u")))))
        .toMap
      val batch = graft.SparkEntry.queries("q_bigram_lm")(spark, sf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(spark.table("bigram_stream").count() == batch.size)
      assert(got == batch)
    } finally q.stop()
  }

  test("watermarked windowed counts emit a window once the watermark passes it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val df = source.toDF().toDF("ts", "event_type")
    val q = StreamingKernels.windowedCounts(df, "ts", col("event_type"))
      .writeStream.format("memory").queryName("win_stream")
      .outputMode("append").start()
    try {
      source.addData(
        (ts("2026-01-01 10:05:00"), "click"),
        (ts("2026-01-01 10:40:00"), "click"),
        (ts("2026-01-01 10:50:00"), "view"))
      q.processAllAvailable()
      // Advance event time far enough that the 10:00 window closes
      // (watermark = max event time - 1 h).
      source.addData((ts("2026-01-01 12:30:00"), "click"))
      q.processAllAvailable()
      val got = spark.table("win_stream").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(got.contains(("2026-01-01 10:00:00.0", "click", 2L)))
      assert(got.contains(("2026-01-01 10:00:00.0", "view", 1L)))
      // The 12:00 window is still open: nothing emitted for it yet.
      assert(!got.exists(_._1.startsWith("2026-01-01 12")))
    } finally q.stop()
  }

  test("windowed t-digest quantiles: closed windows emit rank-sound estimates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10:00 window holds 1..100 spread across two micro-batches — the
    // state between them is the serialized digest, not the raw values.
    val w1 = (1 to 100).map(i => (ts("2026-01-01 10:30:00"), i.toDouble))
    val source = MemoryStream[(Timestamp, Double)]
    val q = StreamingKernels.windowedQuantiles(
        source.toDF().toDF("ts", "v"), "ts", "v")
      .writeStream.format("memory").queryName("quant_stream")
      .outputMode("append").start()
    try {
      source.addData(w1.take(60): _*)
      q.processAllAvailable()
      source.addData(w1.drop(60): _*)
      q.processAllAvailable()
      source.addData((ts("2026-01-01 12:30:00"), 0.0)) // close 10:00 window
      q.processAllAvailable()
      val rows = spark.table("quant_stream").collect()
        .map(r => r.getTimestamp(0).toString ->
          (r.getLong(1), r.getSeq[Double](2)))
        .toMap
      val (n, qs) = rows("2026-01-01 10:00:00.0")
      assert(n == 100L)
      // n=100 ≤ δ: singleton centroids, so the estimates are exact
      // midpoint order statistics of 1..100.
      assert(math.abs(qs(0) - 50.5) <= 1.0, s"p50 ${qs(0)}")
      assert(math.abs(qs(1) - 90.5) <= 1.0, s"p90 ${qs(1)}")
      assert(!rows.contains("2026-01-01 12:00:00.0")) // still open
    } finally q.stop()
  }

  test("observed checks ride each micro-batch as progress metrics, stream unchanged") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[java.lang.Double]
    val df = StreamingKernels.observedChecks(
      source.toDF().toDF("v"), "v", lo = 0.0, hi = 100.0)
    val q = df.writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").start()
    try {
      source.addData(1.0, 50.0, null, 250.0, -3.0)
      q.processAllAvailable()
      val m = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("graft_checks"))).last
      assert(m.getAs[Long]("n_rows") == 5L)
      assert(m.getAs[Long]("n_null") == 1L)
      assert(m.getAs[Long]("n_out_of_range") == 2L)
      // Monitoring is pass-through: every input row reached the sink.
      assert(spark.table("obs_stream").count() == 5L)
    } finally q.stop()
  }

  test("windowed KMV distinct: closed windows report exact-below-k counts across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10:00 window sees 80 distinct words (with dups) across TWO
    // micro-batches — the state carried between them is the k-minima
    // buffer, and 80 < k=128 puts the estimate on the exact path, so
    // the test pins a hard number, not a tolerance.
    val words = (1 to 80).map(i => s"w$i")
    val source = MemoryStream[(Timestamp, String)]
    val df = source.toDF().toDF("ts", "word")
    val q = StreamingKernels.windowedDistinct(
        df, "ts", graft.functions.TextFunctions.hash60(col("word")))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("append").start()
    try {
      source.addData(words.take(50).map((ts("2026-01-01 10:30:00"), _)): _*)
      q.processAllAvailable()
      // Second batch overlaps 20 already-seen words: dedup must span
      // the micro-batch boundary through the serialized buffer.
      source.addData(words.drop(30).map((ts("2026-01-01 10:40:00"), _)): _*)
      q.processAllAvailable()
      source.addData((ts("2026-01-01 12:30:00"), "closer")) // close 10:00
      q.processAllAvailable()
      val rows = spark.table("kmv_stream").collect()
        .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(rows("2026-01-01 10:00:00.0") == (80L, 80L))
      assert(!rows.contains("2026-01-01 12:00:00.0")) // still open
    } finally q.stop()
  }

  test("session windows close after the gap and count their events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val df = source.toDF().toDF("ts", "user_id")
    val q = StreamingKernels.sessionCounts(df, "ts", col("user_id"),
      watermark = "1 hour", gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // u1: two events 10 min apart (one session); u2: one event.
      source.addData(
        (ts("2026-01-01 10:00:00"), "u1"),
        (ts("2026-01-01 10:10:00"), "u1"),
        (ts("2026-01-01 10:05:00"), "u2"))
      q.processAllAvailable()
      // Advance watermark past the sessions' close.
      source.addData((ts("2026-01-01 13:00:00"), "u3"))
      q.processAllAvailable()
      val got = spark.table("sess_stream").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSet
      assert(got == Set(("u1", 2L), ("u2", 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running counts across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Long)]
    val q = StreamingKernels.runningCounts(source.toDS())
      .toDF("user", "total")
      .writeStream.format("memory").queryName("state_stream")
      .outputMode("update").start()
    try {
      source.addData(("a", 2L), ("a", 3L), ("b", 1L))
      q.processAllAvailable()
      source.addData(("a", 5L))
      q.processAllAvailable()
      val last = spark.table("state_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      // State carried over: a = 2+3 then +5 = 10.
      assert(last == Map("a" -> 10L, "b" -> 1L))
    } finally q.stop()
  }

  test("streaming heavy hitters: bounded state, exact in the no-eviction regime") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val q = StreamingKernels.streamingHeavyHitters(source.toDS(),
        capacity = 8, k = 3)
      .toDF("grp", "term", "est", "err")
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    try {
      source.addData(("g", "a"), ("g", "a"), ("g", "b"), ("g", "c"))
      q.processAllAvailable()
      source.addData(("g", "a"), ("g", "b"), ("g", "b"), ("g", "b"))
      q.processAllAvailable()
      // State carried across batches; capacity 8 > 3 distinct terms, so
      // counts are exact with zero error: a=3, b=4, c=1.
      val rows = spark.table("hh_stream").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val latest = rows.groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).max }
      assert(latest == Map("a" -> 3L, "b" -> 4L, "c" -> 1L))
      assert(rows.forall(_._3 == 0L))
    } finally q.stop()
  }

  test("event-time custom sessionization closes sessions at the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val q = StreamingKernels.sessionizeWithState(source.toDS())
      .toDF("user", "n_events", "session_end")
      .writeStream.format("memory").queryName("custom_sess")
      .outputMode("append").start()
    try {
      source.addData(
        (ts("2026-01-01 10:00:00"), "u1"),
        (ts("2026-01-01 10:10:00"), "u1"),
        (ts("2026-01-01 10:05:00"), "u2"))
      q.processAllAvailable()
      assert(spark.table("custom_sess").count() == 0) // nothing closed yet
      // Watermark advance (1h behind max event time) past both
      // sessions' gap deadlines closes them.
      source.addData((ts("2026-01-01 13:00:00"), "u3"))
      q.processAllAvailable()
      source.addData((ts("2026-01-01 13:00:01"), "u3")) // extra batch applies timeouts
      q.processAllAvailable()
      val got = spark.table("custom_sess").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2).toString)).toSet
      assert(got == Set(
        ("u1", 2L, "2026-01-01 10:10:00.0"),
        ("u2", 1L, "2026-01-01 10:05:00.0")))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val purchases = MemoryStream[(String, Long, Timestamp)]
    val q = StreamingKernels.clickAttribution(
      clicks.toDF().toDF("c_user", "click_ts"),
      purchases.toDF().toDF("p_user", "p_id", "p_ts"))
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      clicks.addData(
        ("u1", ts("2026-01-01 10:00:00")), // in window for p1 (25 min before)
        ("u1", ts("2026-01-01 09:40:00")), // outside the 30-min window
        ("u2", ts("2026-01-01 10:20:00"))) // wrong user for p1
      purchases.addData(("u1", 1L, ts("2026-01-01 10:25:00")))
      q.processAllAvailable()
      // Inner interval join emits as soon as both sides are present.
      val got = spark.table("attr_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(3).toString))
        .toSet
      assert(got == Set((1L, "u1", "2026-01-01 10:00:00.0")))
      // A second purchase joins a click that arrived EARLIER — state
      // held it within the watermark horizon.
      purchases.addData(("u2", 2L, ts("2026-01-01 10:30:00")))
      q.processAllAvailable()
      val got2 = spark.table("attr_stream").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got2 == Set((1L, "u1"), (2L, "u2")))
      // LATE data beyond the watermark is DROPPED, not joined: advance
      // the global watermark (the min across both sides, so both get a
      // 16:00 row) far past the morning, then deliver a purchase that
      // would have matched u1's click — hours late, it must not emit.
      clicks.addData(("wm", ts("2026-01-01 16:00:00")))
      purchases.addData(("wm", 98L, ts("2026-01-01 16:00:00")))
      q.processAllAvailable()
      purchases.addData(("u1", 99L, ts("2026-01-01 10:26:00"))) // ~5 h late
      q.processAllAvailable()
      val ids = spark.table("attr_stream").collect().map(_.getLong(0)).toSet
      assert(!ids.contains(99L),
        "late purchase beyond the watermark must be dropped")
    } finally q.stop()
  }

  test("event-time streaming funnel finalizes stages from out-of-order input") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String, String)]
    val q = StreamingKernels.funnelWithState(source.toDS())
      .toDF("user", "signup", "click", "purchase")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // u1's click arrives BEFORE its signup (out of order, across
      // batches) — a monotone accumulator would miss the funnel.
      source.addData((ts("2026-01-01 10:05:00"), "u1", "click"))
      q.processAllAvailable()
      source.addData(
        (ts("2026-01-01 10:00:00"), "u1", "signup"), // late, in horizon
        (ts("2026-01-01 10:10:00"), "u1", "purchase"),
        (ts("2026-01-01 10:02:00"), "u2", "purchase"), // no signup first
        (ts("2026-01-01 10:03:00"), "u3", "signup")) // stalls at stage 1
      q.processAllAvailable()
      assert(spark.table("funnel_stream").count() == 0) // nothing final yet
      // Watermark (1 h behind max event time) passes every user's quiet
      // deadline; the extra batch applies the timeouts.
      source.addData((ts("2026-01-01 14:00:00"), "wm", "view"))
      q.processAllAvailable()
      source.addData((ts("2026-01-01 14:00:01"), "wm", "view"))
      q.processAllAvailable()
      val got = spark.table("funnel_stream").collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3))).toSet
      assert(got.contains(("u1", true, true, true)))
      assert(got.contains(("u2", false, false, false)))
      assert(got.contains(("u3", true, false, false)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits a final summary and expires idle keys") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, Long)]
    val q = StreamingKernels.idleKeySummaries(source.toDS(), idleMs = 50)
      .toDF("user", "total", "expired")
      .writeStream.format("memory").queryName("idle_stream")
      .outputMode("update").start()
    try {
      // NOTE: processAllAvailable() must not be used with
      // processing-time timeouts — the engine keeps scheduling
      // timeout-check batches and the call never observes quiescence
      // (it hangs). Poll the sink with a deadline instead.
      def rows() = spark.table("idle_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
      def awaitRow(want: (String, Long, Boolean)): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (System.currentTimeMillis() < deadline && !rows().contains(want)) {
          assert(q.exception.isEmpty, s"stream failed: ${q.exception}")
          Thread.sleep(100)
        }
        assert(rows().contains(want), s"timed out waiting for $want; have ${rows()}")
      }
      source.addData(("a", 2L), ("a", 3L))
      awaitRow(("a", 5L, false)) // running update
      source.addData(("b", 1L)) // keeps batches flowing past a's idle gap
      awaitRow(("a", 5L, true)) // expiry summary with final total
      awaitRow(("b", 1L, false))
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val df = source.toDF().toDF("ts", "fp")
    val q = StreamingKernels.dedupWithinWatermark(df, "ts", "1 hour", Seq("fp"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t = ts("2026-01-01 10:00:00")
      source.addData((t, "a"), (t, "a"), (t, "b"))
      q.processAllAvailable()
      source.addData((t, "a")) // same batch-horizon duplicate, dropped
      q.processAllAvailable()
      val got = spark.table("dedup_stream").collect().map(_.getString(1)).sorted
      assert(got.toSeq == Seq("a", "b"))
    } finally q.stop()
  }

  test("stateful query restarts from checkpoint with state intact") {
    // Production fault-tolerance contract: keyed state lives in the
    // checkpointed state store, so a stopped query resumes with its
    // running totals — not from zero — and only unprocessed offsets
    // replay. This is the property that makes the streaming kernels
    // restartable mid-day on a real cluster.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val source = MemoryStream[(String, Long)]
    // The memory sink refuses checkpoint recovery; foreachBatch is the
    // recovery-capable sink (and the production shape for arbitrary
    // downstream writes).
    val results = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def start() = StreamingKernels.runningCounts(source.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        batch.collect().foreach { case (k, v) => results.put(k, v) }
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()

    val q1 = start()
    try {
      source.addData(("k", 1L), ("k", 2L), ("other", 10L))
      q1.processAllAvailable()
      assert(results.get("k") == 3L && results.get("other") == 10L,
        s"unexpected first-run totals: $results")
    } finally q1.stop()

    // Data arriving while the query is down, then a restart from the
    // same checkpoint: totals must CONTINUE (3 + 4), not reset.
    source.addData(("k", 4L))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(results.get("k") == 7L, s"state lost across restart: $results")
    } finally q2.stop()
  }

  test("streaming clean-ingest pipeline dedups, quality-gates, and splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "source", "text")
    val q = StreamingKernels.cleanIngest(docs)
      .writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    try {
      val goodText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
      source.addData(
        (1L, ts("2026-01-01 10:00:00"), "web", goodText),
        (2L, ts("2026-01-01 10:01:00"), "web", goodText), // exact dup: dropped
        (3L, ts("2026-01-01 10:02:00"), "web", "too short")) // quality: dropped
      q.processAllAvailable()
      source.addData(
        (4L, ts("2026-01-01 10:10:00"), "books", goodText), // in-horizon dup
        (5L, ts("2026-01-01 10:11:00"), "books",
          goodText.replace("alpha", "omega"))) // new content: kept
      q.processAllAvailable()
      val got = spark.table("clean_stream").collect()
        .map(r => (r.getLong(0), r.getString(3), r.getLong(4))).sortBy(_._1)
      assert(got.map(_._1).toSeq == Seq(1L, 5L), s"got ${got.toSeq}")
      // Split labels must equal the deterministic driver-side hash —
      // the same family the batch split query is oracle-checked on.
      def expSplit(id: Long): String = {
        val b = graft.functions.VectorFunctions.hash60Scala(s"split:$id") % 100
        if (b < 80) "train" else if (b < 90) "valid" else "test"
      }
      got.foreach { case (id, split, n) =>
        assert(split == expSplit(id) && n == 20L, s"doc $id: ($split, $n)")
      }
    } finally q.stop()
  }

  test("incremental ingest dedups against the static historical corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Yesterday's corpus: fingerprints of already-admitted docs.
    val historical = Seq("seen before text", "also seen")
      .toDF("text")
      .select(graft.functions.TextFunctions.fingerprintExact(col("text")).as("fp"))
    val source = MemoryStream[(Long, Timestamp, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingKernels.dedupAgainstCorpus(docs, historical)
      .writeStream.format("memory").queryName("ingest_stream")
      .outputMode("append").start()
    try {
      source.addData(
        (1L, ts("2026-01-01 10:00:00"), "seen before text"), // in corpus: dropped
        (2L, ts("2026-01-01 10:01:00"), "brand new text"),   // admitted
        (3L, ts("2026-01-01 10:02:00"), "brand new text"))   // in-stream dup: dropped
      q.processAllAvailable()
      source.addData(
        (4L, ts("2026-01-01 10:10:00"), "also seen"),        // in corpus: dropped
        (5L, ts("2026-01-01 10:11:00"), "another new one"))  // admitted
      q.processAllAvailable()
      val got = spark.table("ingest_stream").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(2L, 5L), s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("bloom-screened ingest dedup admits the same set; negatives skip the join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val historical = Seq("seen before text", "also seen").toDF("text")
      .select(graft.functions.TextFunctions.hash60(col("text")).as("fp"))
    // The corpus filter, built once at setup (batch side).
    val bloom = historical
      .agg(graft.functions.BloomBuildAgg(col("fp"), 1024L, 0.01).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
    // No false negatives: every historical fp must be flagged.
    historical.collect().map(_.getLong(0)).foreach { fp =>
      assert(graft.functions.BloomImpl.mightContain(bloom, fp))
    }
    val source = MemoryStream[(Long, Timestamp, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingKernels.dedupAgainstCorpusBloom(docs, historical, bloom)
      .writeStream.format("memory").queryName("ingest_bloom_stream")
      .outputMode("append").start()
    try {
      source.addData(
        (1L, ts("2026-01-01 10:00:00"), "seen before text"), // in corpus: dropped
        (2L, ts("2026-01-01 10:01:00"), "brand new text"),   // admitted
        (3L, ts("2026-01-01 10:02:00"), "brand new text"))   // in-stream dup: dropped
      q.processAllAvailable()
      source.addData(
        (4L, ts("2026-01-01 10:10:00"), "also seen"),        // in corpus: dropped
        (5L, ts("2026-01-01 10:11:00"), "another new one"))  // admitted
      q.processAllAvailable()
      val got = spark.table("ingest_bloom_stream").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(2L, 5L), s"got ${got.toSeq}")
    } finally q.stop()
  }

  test("streaming minhash near-dup flags out-of-order near-duplicates across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingKernels.nearDupMinhash(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      val docA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
      val docB = docA.replace("upsilon", "phi") // 1 of 18 shingles differs
      val other = "one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"

      // Batch 1: the keeper and an unrelated doc.
      source.addData((1L, ts("2026-01-01 10:00:00"), docA),
        (2L, ts("2026-01-01 10:01:00"), other))
      q.processAllAvailable()
      assert(spark.table("neardup_stream").isEmpty)

      // Batch 2: a near-duplicate of doc 1 arriving LATER with an
      // EARLIER event time (out-of-order, inside the watermark) — it
      // must be flagged against the already-seen keeper (arrival-order
      // semantics), with the exact Jaccard of the verify step.
      source.addData((3L, ts("2026-01-01 09:55:00"), docB))
      q.processAllAvailable()
      val verdicts = spark.table("neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // One verdict per agreeing band; distinct pairs reconcile downstream.
      assert(verdicts.nonEmpty)
      assert(verdicts.map(v => (v._1, v._2)).distinct.toSeq == Seq((3L, 1L)))
      // J = 17/19 (20 tokens, 18 shingles, last shingle differs... with
      // the changed token in the final 3-shingle only): |∩|=17, |∪|=19.
      verdicts.foreach(v => assert(math.abs(v._3 - 17.0 / 19) < 1e-6, s"J=${v._3}"))

      // Batches 3-4: unrelated docs 3 hours later advance the watermark
      // past every earlier band's quiet timeout; their state expires.
      source.addData((10L, ts("2026-01-01 13:00:00"),
        "red orange yellow green blue indigo violet pink black white " +
          "gold silver bronze copper iron tin lead zinc nickel chrome"))
      q.processAllAvailable()
      source.addData((11L, ts("2026-01-01 13:05:00"),
        "car bus train plane boat bike scooter truck van tram " +
          "ferry rocket glider subway monorail cab sled barge yacht canoe"))
      q.processAllAvailable()
      // Batch 5: an exact copy of doc 1 — its band state is gone, so no
      // verdict: state is the watermark horizon, never the corpus.
      source.addData((5L, ts("2026-01-01 13:10:00"), docA))
      q.processAllAvailable()
      val after = spark.table("neardup_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(!after.exists(_._1 == 5L),
        s"doc 5 flagged against expired state: ${after.toSeq}")
    } finally q.stop()
  }

  test("streaming quota admission fills each source's quota then drops forever") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingKernels.quotaFill(source.toDS(), quota = 3)
      .toDF("source", "doc_id", "admit_idx")
      .writeStream.format("memory").queryName("quota_stream")
      .outputMode("append").start()
    try {
      // Quota crossings land in separate micro-batches so the test
      // depends only on batch arrival order, never intra-batch order.
      source.addData((1L, "a"), (2L, "a"), (3L, "b"))
      q.processAllAvailable()
      source.addData((4L, "a"), (6L, "b"))
      q.processAllAvailable()
      source.addData((5L, "a"), (8L, "b")) // a is full: 5 dropped
      q.processAllAvailable()
      source.addData((7L, "a"), (9L, "b")) // both full now
      q.processAllAvailable()
      val rows = spark.table("quota_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._3))
      assert(rows.filter(_._1 == "a").map(_._2).toSeq == Seq(1L, 2L, 4L))
      assert(rows.filter(_._1 == "b").map(_._2).toSeq == Seq(3L, 6L, 8L))
      // Admission indices are contiguous per source.
      assert(rows.filter(_._1 == "a").map(_._3).toSeq == Seq(1L, 2L, 3L))
      assert(rows.filter(_._1 == "b").map(_._3).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming drift monitor: closed windows report TVD vs the reference") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Double)]
    val df = source.toDF().toDF("ts", "value")
    // 4 buckets over value in [0, 4): reference = uniform shares.
    val q = StreamingKernels.driftMonitor(df, "ts", "value",
      refSharesU = Seq(250000L, 250000L, 250000L, 250000L), vmaxU = 399L)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").start()
    try {
      // Window 1: perfectly uniform -> TVD 0. Window 2: everything in
      // bucket 0 -> TVD = (|1e6-25e4| + 3*|0-25e4|)/2 = 750000.
      val w1 = ts("2026-01-01 10:00:00")
      val w2 = ts("2026-01-01 11:00:00")
      source.addData((w1, 0.5), (w1, 1.5), (w1, 2.5), (w1, 3.5))
      source.addData((w2, 0.1), (w2, 0.2), (w2, 0.3))
      q.processAllAvailable()
      // Advance the watermark far enough to close both windows.
      source.addData((ts("2026-01-01 14:00:00"), 2.0))
      q.processAllAvailable()
      val got = spark.table("drift_stream").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1.getTime)
      assert(got.length == 2, s"got ${got.toSeq}")
      assert(got(0)._2 == 4L && got(0)._3 == 0L, s"uniform window: ${got(0)}")
      assert(got(1)._2 == 3L && got(1)._3 == 750000L,
        s"drifted window: ${got(1)}")
    } finally q.stop()
  }

  test("foreachBatch CDC upsert: latest seq wins per key, deletes drop keys") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, String, Long)] // key, seq, op, val
    val cdc = source.toDF().toDF("k", "seq", "op", "v")
    // foreachBatch is the MERGE sink shape; the driver-held target
    // stands in for the key-partitioned table a cluster would merge
    // into. Each batch applies the shared upsertCompact expression.
    var target = Seq.empty[(Long, Long, String, Long)]
      .toDF("k", "seq", "op", "v")
    val q = cdc.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        target = StreamingKernels
          .upsertCompact(target, batch, "k", "seq").cache()
        target.count() // pin before the next batch mutates the var
        ()
      }
      .outputMode("append").start()
    try {
      source.addData((1L, 1L, "N", 10L), (2L, 1L, "N", 20L))
      q.processAllAvailable()
      source.addData((1L, 3L, "U", 11L), (3L, 1L, "N", 30L))
      q.processAllAvailable()
      // Out-of-order straggler (seq 2 < applied 3) must lose; delete
      // removes key 2 from the LIVE view but stays as a tombstone.
      source.addData((1L, 2L, "U", 99L), (2L, 2L, "D", 0L))
      q.processAllAvailable()
      // A post-delete out-of-order update must NOT resurrect key 2 —
      // the tombstone outranks it.
      source.addData((2L, 1L, "U", 77L))
      q.processAllAvailable()
      val live = StreamingKernels.upsertRead(target).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
        .toMap
      assert(live == Map(1L -> ((3L, "U", 11L)), 3L -> ((1L, "N", 30L))),
        s"unexpected live view: $live")
      val tomb = target.collect().filter(_.getString(2) == "D")
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(tomb == Seq((2L, 2L)), s"tombstone must survive: $tomb")
    } finally q.stop()
  }

  test("boilerplate screen strips trained chunks statelessly in-flight") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Trained set: one 8-token header chunk (the batch trainer's
    // output); bloom baked from its hash60.
    val header = "standard promo header from src all rights reserved"
    val bloom = Seq(header).toDF("c")
      .select(graft.functions.TextFunctions.hash60(col("c")).as("h"))
      .agg(graft.functions.BloomBuildAgg(col("h"), 1024L, 0.001).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)

    val bodies = Map(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "one two three four five six seven eight",
      3L -> "lone short tail")
    val source = MemoryStream[(Long, Timestamp, String)]
    val docs = source.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingKernels.boilerplateScreen(docs, bloom)
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("append").start()
    try {
      source.addData(bodies.toSeq.map { case (id, b) =>
        (id, ts("2024-01-01 10:00:00"), s"$header $b") })
      q.processAllAvailable()
      val got = spark.table("boiler_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4))))
        .toMap
      assert(got.keySet == bodies.keySet)
      // Exact model: chunk in 8s after the header, probe the SAME bloom
      // bytes via BloomImpl — parity including any false positive.
      bodies.foreach { case (id, body) =>
        val t = (header + " " + body).split(" ")
        val chunks = (0 to (t.length - 1) / 8)
          .map(i => t.slice(i * 8, i * 8 + 8).mkString(" "))
        val kept = chunks.filterNot(c => graft.functions.BloomImpl
          .mightContain(bloom, graft.functions.VectorFunctions.hash60Scala(c)))
        val (nChunks, nKept, keptText) = got(id)
        assert(nChunks == chunks.length, s"doc $id n_chunks")
        assert(nKept == kept.length, s"doc $id n_kept")
        assert(keptText == kept.mkString(" "), s"doc $id kept_text")
        // The trained header chunk must NEVER survive (no false
        // negatives), and with fpp 0.001 these few body chunks do not
        // false-positive (deterministic for these fixed strings).
        assert(!keptText.contains("standard promo header"), s"doc $id header")
        assert(keptText == body, s"doc $id body intact")
      }
    } finally q.stop()
  }

  test("streaming BPE encode is bit-identical to the batch encode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"

    // Train offline on the fixture corpus (the batch half)...
    val words = graft.sources.Tables.documents(s, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val (merges, _) = graft.operators.BpeTrainer.train(words, 6)
    graft.queries.StagedCache.releaseAll()
    // ...and the batch per-doc counts to match against.
    val batch = graft.queries.CorpusQueries.queries("q_bpe_encode")(s, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    graft.queries.StagedCache.releaseAll()

    val docs = graft.sources.Tables.documents(s, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1)))
    val source = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingKernels.bpeEncode(
        source.toDF().toDF("doc_id", "ts", "text"),
        merges.map(m => (m.left, m.right)))
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").start()
    try {
      source.addData(docs.toSeq)
      q.processAllAvailable()
      val got = spark.table("bpe_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(got.keySet == batch.keySet, "one row per document")
      var compressed = 0
      got.foreach { case (id, (nWords, nBpe)) =>
        val (bWords, bChars, bBpe) = batch(id)
        assert(nWords == bWords && nBpe == bBpe,
          s"doc $id: stream ($nWords,$nBpe) != batch ($bWords,$bBpe)")
        // Merges only ever reduce symbol counts below the char count.
        assert(nBpe <= bChars, s"doc $id: encode grew past chars")
        if (nBpe < bChars) compressed += 1
      }
      assert(compressed > 0, "the trained merges must compress somewhere")
    } finally q.stop()
  }

  test("streaming ANN ingest assignment is bit-identical to the batch argmin") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // TRAIN batch-side: the collected centroid model (the refresh
    // artifact), and the batch row-level assignment as ground truth.
    val model = graft.queries.VectorQueries.trainedCentroidModel(s, sf, 3)
    assert(model.size >= 16, "derived K floors at 16")
    val batch = graft.queries.VectorQueries.batchAssign(s, sf, 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    graft.queries.StagedCache.releaseAll()

    val vecs = graft.sources.Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), ts("2026-01-01 10:00:00"),
        r.getSeq[Float](1)))
    val source = MemoryStream[(Long, Timestamp, Seq[Float])]
    val q = StreamingKernels.annAssign(
        source.toDF().toDF("vec_id", "ts", "embedding"), model)
      .writeStream.format("memory").queryName("ann_ingest")
      .outputMode("append").start()
    try {
      // Two micro-batches; the stateless kernel emits each vector once.
      source.addData(vecs.take(vecs.length / 2).toSeq)
      q.processAllAvailable()
      source.addData(vecs.drop(vecs.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("ann_ingest").collect()
        .map(r => r.getLong(r.fieldIndex("vec_id")) ->
          ((r.getLong(r.fieldIndex("cid")),
            r.getLong(r.fieldIndex("dist_u")))))
        .toMap
      assert(got.keySet == batch.keySet, "one assignment per vector")
      assert(got == batch,
        "streaming (cid, dist_u) must match the batch argmin exactly")
    } finally q.stop()
  }

  test("foreachBatch ingest through appendWithStats keeps the sidecar current") {
    // The streaming half of the lake-maintenance story: a micro-batch
    // sink that appends rows AND folds the batch's stats into the
    // _stats sidecar, so stats-pruned scans stay sound against a live
    // ingest without ever rescanning the table. Three out-of-order
    // micro-batches; end state must equal a from-scratch ANALYZE.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = s"${sys.props("java.io.tmpdir")}/graft_streamlake_${spark.sparkContext.applicationId}/t"
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source", "n_chars")
    // Seed: an initial batch write + ANALYZE, as a deployment would.
    docs.filter(col("doc_id") % 4 === 0)
      .write.mode("overwrite").partitionBy("source").parquet(table)
    graft.operators.LakeMaintenance.collectStats(spark, table, "source", "n_chars")

    val rest = docs.filter(col("doc_id") % 4 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val source = MemoryStream[(Long, String, Long)]
    val q = source.toDF().toDF("doc_id", "source", "n_chars")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.LakeMaintenance.appendWithStats(
          spark, table, batch, "source", "n_chars")
      }
      .start()
    try {
      rest.grouped(math.max(1, rest.length / 3)).foreach { chunk =>
        source.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val sidecar = spark.read.parquet(s"$table/_stats")
      .orderBy("source").collect().toSeq
    val expected = spark.read.parquet(table)
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("row_cnt"),
        org.apache.spark.sql.functions.min("n_chars").as("min_v"),
        org.apache.spark.sql.functions.max("n_chars").as("max_v"))
      .orderBy("source").collect().toSeq
    assert(sidecar == expected,
      "per-micro-batch merges must equal the from-scratch ANALYZE")
    assert(spark.read.parquet(table).count() == docs.count(),
      "every micro-batch row landed exactly once")
  }
}
