package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions
import graft.operators.{InvertedIndex, WordCount}

/** Structured-Streaming variants of the engine's kernels (SURVEY §2.9).
  *
  * The reference is batch-only; these exist because the same logical
  * plans run incrementally on Spark: a `readStream` source swaps in, the
  * transform graph is IDENTICAL (the batch functions are reused below —
  * one definition, two execution modes), and state is bounded by
  * watermarks. At 100 TB/day the streaming path is how the pipeline
  * keeps up: incremental aggregation state instead of daily re-scans.
  *
  * State-boundedness notes (what survives unbounded input):
  *  - word count / inverted index: keyed state grows with |vocabulary|,
  *    not |input| — safe for complete/update output of bounded key
  *    domains; for unbounded keys switch to windowed variants.
  *  - windowed/session aggregates: watermark expires state; late rows
  *    beyond the watermark are dropped (documented trade).
  *  - streaming dedup: `dropDuplicates` keyed on (id, event-time) with a
  *    watermark keeps exactly the in-horizon fingerprint set.
  */
object StreamingKernels {

  /** Streaming word count — same transform graph as the batch kernel
    * minus the global sort (a total order over an infinite stream is
    * meaningless; sort at query time over the complete-mode sink). */
  def wordCount(lines: DataFrame, textCol: String = "value"): DataFrame =
    WordCount.tokens(lines, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Streaming inverted index: same parse + collect_set aggregation. */
  def invertedIndex(lines: DataFrame, textCol: String = "value"): DataFrame =
    InvertedIndex.parsePairs(lines, textCol)
      .groupBy("word")
      .agg(concat_ws(",",
        transform(sort_array(collect_set(col("doc_id"))), _.cast("string")))
        .as("doc_ids"))

  /** Watermarked tumbling-window counts over an event stream (the
    * streaming twin of the batch `q_event_window_agg`). */
  def windowedCounts(events: DataFrame, tsCol: String, eventType: Column,
                     watermark: String = "1 hour",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), eventType.as("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Windowed quantile monitoring: per-tumbling-window value quantiles
    * from the custom t-digest aggregate ([[graft.functions.TDigestAgg]])
    * — the latency/quality-percentile dashboard feed. This is the
    * sketch's mergeability doing real work: each micro-batch folds into
    * ~2·δ centroids of streaming state per window (never the window's
    * raw values), partial merges compound no error, and the watermark
    * expires closed windows' state. The batch twin's rank-bound
    * guarantee (`q_percentiles_tdigest`) carries over per window. */
  def windowedQuantiles(events: DataFrame, tsCol: String, valueCol: String,
                        compression: Int = 100,
                        percentiles: Seq[Double] = Seq(0.5, 0.9),
                        watermark: String = "1 hour",
                        windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.TDigestAgg(
        col(valueCol).cast("double"), compression, percentiles).as("td"))
      .select(col("window.start").as("window_start"),
        col("td.n").as("n"), col("td.qs").as("qs"))

  /** Per-micro-batch data-quality metrics via `observe` — the
    * streaming twin of q_data_checks' row-level assertions (and the
    * shape of Delta Live Tables expectations): row count, null-key
    * count, and out-of-range count ride EVERY micro-batch as observed
    * metrics on the progress event, costing zero extra passes and
    * zero state — the accumulators fold into the batch's existing
    * execution exactly like the kernel counters (§2.4 A4). The stream
    * itself passes through unchanged: monitoring must not perturb the
    * pipeline it monitors. */
  def observedChecks(events: DataFrame, valueCol: String,
                     lo: Double, hi: Double): DataFrame =
    events.observe("graft_checks",
      count(lit(1)).as("n_rows"),
      sum(col(valueCol).isNull.cast("long")).as("n_null"),
      sum((!col(valueCol).between(lo, hi)).cast("long")).as("n_out_of_range"))

  /** Windowed distinct-cardinality monitoring via the KMV sketch
    * (streaming twin of the batch `kmv_distinct` corpus stats): per
    * tumbling window, the estimated number of distinct values from a
    * BOUNDED k-minima buffer — the vocabulary-growth / unique-user
    * dashboard feed. Mergeability is what makes it streamable: each
    * micro-batch folds into ≤ k longs of state per window (never the
    * raw distinct set, which `approx_count_distinct` also bounds but
    * whose HLL state no oracle can mirror — KMV state is the k
    * smallest hashes, reproducible on any engine), and the watermark
    * expires closed windows. Deterministic: the estimate depends only
    * on the window's value SET, so replay/recovery converges to the
    * same answer. */
  def windowedDistinct(events: DataFrame, tsCol: String, hashCol: Column,
                       k: Int = 128,
                       watermark: String = "1 hour",
                       windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.KmvDistinctAgg(hashCol, k).as("sk"))
      .select(col("window.start").as("window_start"),
        col("sk.n_filled").as("n_filled"), col("sk.est").as("est_distinct"))

  /** Gap-based sessionization via `session_window` (streaming twin of
    * the batch lag-based `q_sessionize`). */
  def sessionCounts(events: DataFrame, tsCol: String, userId: Column,
                    watermark: String = "1 hour",
                    gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), userId.as("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup within the watermark horizon: state holds one
    * fingerprint per in-horizon document, never the corpus. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String,
                           watermark: String, keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Custom keyed state via `mapGroupsWithState` (the fully general
    * stateful extension point — the streaming twin of the reference's
    * Reducer-with-setup()-state surface, SURVEY §2.10): a running
    * per-key event count that survives across micro-batches. State is
    * one long per key; use GroupStateTimeout in production to expire
    * idle keys. */
  def runningCounts(events: org.apache.spark.sql.Dataset[(String, Long)])
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout()) {
        case (key, rows, state) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          (key, total)
      }
  }

  /** Streaming heavy hitters: per-group top terms with
    * SpaceSaving-BOUNDED state ([[graft.functions.SpaceSavingBuffer]] —
    * the same summary the batch `heavy_hitters` aggregate keeps), ≤
    * `capacity` (term, est, err) entries per group key no matter how
    * many distinct terms stream through. Each micro-batch folds its
    * rows into the summary and emits the current top `k` — the
    * unbounded-cardinality-safe form of a streaming
    * `groupBy(term).count().orderBy(desc)` whose state would otherwise
    * grow with the term domain. Update-mode output; the exact regime
    * (capacity ≥ distinct terms) matches batch counts exactly, same as
    * the oracle-checked q_topk_sketch. */
  def streamingHeavyHitters(
      events: org.apache.spark.sql.Dataset[(String, String)], // (group, term)
      capacity: Int, k: Int)
      : org.apache.spark.sql.Dataset[(String, String, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, (Long, Long)],
        (String, String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (group, rows, state) =>
          val buf = new graft.functions.SpaceSavingBuffer(capacity)
          state.getOption.foreach(m => buf.load(m.toSeq))
          rows.foreach(r => buf.offer(r._2))
          val snapshot = buf.toSeq
          state.update(snapshot.toMap)
          snapshot.sortBy { case (t, (c, e)) => (-c, e, t) }
            .take(k).iterator
            .map { case (t, (c, e)) => (group, t, c, e) }
      }
  }

  /** Custom sessionization with EVENT-time expiry: per-user state
    * (count, last event time) whose timeout is the session gap past the
    * last event in EVENT time — the watermark closes sessions, so late
    * data within the watermark still extends them (semantics
    * `session_window` gives declaratively; this is the custom-state
    * form for when per-session state must be richer than an
    * aggregate). One closed-session summary row per expiry, append
    * mode. Watermark-driven timeouts fire on batch boundaries — unlike
    * processing-time timeouts they are processAllAvailable-safe. */
  def sessionizeWithState(
      events: org.apache.spark.sql.Dataset[(java.sql.Timestamp, String)],
      watermark: String = "1 hour", gapMs: Long = 30 * 60 * 1000L)
      : org.apache.spark.sql.Dataset[(String, Long, java.sql.Timestamp)] = {
    import events.sparkSession.implicits._
    events
      .toDF("ts", "user_id").withWatermark("ts", watermark)
      .as[(java.sql.Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[(Long, Long), (String, Long, java.sql.Timestamp)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            val (n, lastMs) = state.get
            state.remove()
            Iterator((user, n, new java.sql.Timestamp(lastMs)))
          } else {
            val (n0, last0) = state.getOption.getOrElse((0L, 0L))
            val batch = rows.toSeq
            val n = n0 + batch.size
            val last = math.max(last0, batch.map(_._1.getTime).max)
            state.update((n, last))
            // Clamp to the watermark: a late-but-not-yet-filtered row
            // (rows older than only the PREVIOUS batch's watermark
            // still reach the function) would otherwise ask for a
            // timeout in the past, which throws and kills the query —
            // the same guard funnelWithState/nearDupMinhash carry.
            state.setTimeoutTimestamp(
              math.max(last + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Watermarked stream-stream interval join: each purchase matched to
    * the same user's clicks in the `joinWindow` before it (the
    * streaming twin of the batch range join `q_range_join`). BOTH
    * sides carry watermarks and the join condition bounds event-time
    * distance, so each side's buffered state is exactly the
    * watermark+interval horizon — the only state-bounded form of a
    * stream-stream join Spark admits in append mode; rows outside the
    * horizon are evicted, late rows beyond the watermark dropped. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       watermark: String = "1 hour",
                       joinWindow: String = "30 minutes"): DataFrame =
    clicks // expected columns: (c_user, click_ts)
      .withWatermark("click_ts", watermark)
      .join(
        purchases // expected columns: (p_user, p_id, p_ts)
          .withWatermark("p_ts", watermark),
        expr(s"c_user = p_user AND " +
          s"click_ts >= p_ts - INTERVAL $joinWindow AND click_ts <= p_ts"),
        "inner")
      .select(col("p_id"), col("p_user").as("user_id"),
        col("p_ts"), col("click_ts"))

  /** Event-time streaming funnel — the streaming twin of the batch
    * `q_funnel` (first signup → first click strictly after it → first
    * purchase strictly after that). Stage transitions depend on event
    * ORDER, so no monotone accumulator can finalize early under
    * out-of-order arrival (a click is only "after signup" once the
    * earliest signup is known); the correct streaming form buffers each
    * user's in-horizon events in state and finalizes when the user has
    * been quiet for `quietMs` in EVENT time — i.e. when the watermark
    * proves no earlier event can still arrive. One summary row per
    * QUIET PERIOD, append mode: as with sessionization, a user whose
    * events resume after a quiet gap starts fresh state and produces a
    * second summary row — the downstream consumer reconciles by taking
    * the OR/latest per user (the only alternative, keeping state
    * forever, is unbounded). State is bounded by the watermark horizon
    * × per-user event rate, the same bound `sessionizeWithState`
    * carries.
    */
  def funnelWithState(
      events: org.apache.spark.sql.Dataset[(java.sql.Timestamp, String, String)],
      watermark: String = "1 hour", quietMs: Long = 30 * 60 * 1000L)
      : org.apache.spark.sql.Dataset[(String, Boolean, Boolean, Boolean)] = {
    import events.sparkSession.implicits._
    events
      .toDF("ts", "user_id", "event_type").withWatermark("ts", watermark)
      .as[(java.sql.Timestamp, String, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[List[(Long, String)], (String, Boolean, Boolean, Boolean)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state) =>
          if (state.hasTimedOut) {
            val evs = state.get
            state.remove()
            // Finalize exactly as the batch funnel does, over the
            // complete buffered (in-horizon) event set.
            def firstAfter(tpe: String, after: Long): Option[Long] = {
              val c = evs.collect { case (t, `tpe`) if t > after => t }
              if (c.isEmpty) None else Some(c.min)
            }
            val signup = {
              val ss = evs.collect { case (t, "signup") => t }
              if (ss.isEmpty) None else Some(ss.min)
            }
            val click = signup.flatMap(firstAfter("click", _))
            val purchase = click.flatMap(firstAfter("purchase", _))
            Iterator((user, signup.isDefined, click.isDefined, purchase.isDefined))
          } else {
            // PREPEND the batch (finalization is order-insensitive):
            // appending with ++ to a List re-walks the whole buffer
            // every batch — O(n²) per user across a long horizon.
            val buffered = rows.map(r => (r._1.getTime, r._3)).toList reverse_:::
              state.getOption.getOrElse(Nil)
            state.update(buffered)
            val last = buffered.map(_._1).max
            // The timeout timestamp must sit beyond the current
            // watermark (late-arriving batches could otherwise compute
            // one behind it).
            state.setTimeoutTimestamp(
              math.max(last + quietMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming ingest twin of the batch `q_pipeline_clean` DAG: exact
    * dedup on the content fingerprint within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state holds one fingerprint
    * per in-horizon doc and expires with the watermark, vs. the batch
    * window over the full corpus), then the same token-count quality
    * gate and deterministic hash split, all map-only. First-arrival
    * wins on duplicates (the only order a stream has — the batch twin
    * keeps min doc_id); docs re-ingested after the horizon pass
    * again, the standard horizon trade of every streaming dedup here.
    * Emits the cleaned, split-labelled stream ready for a partitioned
    * sink (`writeStream.partitionBy("split")`). */
  def cleanIngest(docs: DataFrame, watermark: String = "1 hour",
                  minTokens: Int = 20): DataFrame = {
    val staged = docs // expected columns: (doc_id long, ts timestamp, source, text)
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), col("source"),
        TextFunctions.fingerprintExact(col("text")).as("fp"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
    val bucket = pmod(TextFunctions.hash60(
      concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
    staged
      .dropDuplicatesWithinWatermark("fp")
      .filter(col("n_tokens") >= minTokens)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
      .select("doc_id", "ts", "source", "split", "n_tokens")
  }

  /** Incremental-ingest dedup against a HISTORICAL corpus: the
    * production pattern where today's stream must not re-admit
    * anything already in yesterday's corpus. Two dedup layers:
    * within-stream (`dropDuplicatesWithinWatermark` — watermark-bounded
    * state) and against the static fingerprint table via a
    * STREAM-STATIC left-anti join — the static side is a plain
    * DataFrame (at scale: the corpus fingerprint index on storage,
    * broadcast if small, shuffled-hash otherwise), re-planned per
    * micro-batch, holding NO streaming state. `corpusFps` must expose
    * an `fp` column (e.g. `q_dedup_exact`'s fingerprints). */
  def dedupAgainstCorpus(docs: DataFrame, corpusFps: DataFrame,
                         watermark: String = "1 hour"): DataFrame =
    docs // expected columns: (doc_id long, ts timestamp, text)
      .withWatermark("ts", watermark)
      .withColumn("fp", TextFunctions.fingerprintExact(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("ts"), col("fp"))

  /** Bloom-screened streaming twin of the batch `q_dedup_incremental`:
    * the historical corpus compresses into ONE bit array built at
    * stream setup (a literal in the plan — no per-batch rebuild), and
    * because a Bloom filter admits no false negatives, bloom-NEGATIVE
    * ingest rows are definitively new and take a join-free branch;
    * only the suspects (true dups + fpp·batch) reach the stream-static
    * anti join that re-plans per micro-batch. Trade, stated plainly:
    * the two branches each carry the watermark-bounded within-stream
    * dedup state (doubled, still bounded) in exchange for an anti-join
    * input ∝ suspects — the right side of that trade whenever the
    * corpus index dwarfs the ingest batch, which is the 100 TB shape.
    * Fingerprints are hash60 longs ([[graft.functions.Hash60Expr]]);
    * `corpusFps` must expose a long `fp` column, `bloom` is
    * [[graft.functions.BloomBuildAgg]]'s serialized output over it. */
  def dedupAgainstCorpusBloom(docs: DataFrame, corpusFps: DataFrame,
                              bloom: Array[Byte],
                              watermark: String = "1 hour"): DataFrame = {
    def base = docs // expected columns: (doc_id long, ts timestamp, text)
      .withWatermark("ts", watermark)
      .withColumn("fp", TextFunctions.hash60(col("text")))
      .dropDuplicatesWithinWatermark("fp")
    val suspect = graft.functions.BloomMightContain(lit(bloom), col("fp"))
    val definitelyNew = base.where(!suspect)
    val suspects = base.where(suspect)
      .join(corpusFps.select(col("fp")), Seq("fp"), "left_anti")
    definitelyNew.unionByName(suspects)
      .select(col("doc_id"), col("ts"), col("fp"))
  }

  /** Streaming MinHash near-dup detection — the streaming twin of the
    * batch `q_near_dup_minhash` (same tokens → hashed 3-shingles → 8
    * minhash components → 4 band keys pipeline, via the SAME
    * [[TextFunctions]] columns — one definition, two execution modes).
    *
    * Shape: band keys are exploded and the stream grouped per band key;
    * per-band state holds the in-horizon REPRESENTATIVE docs (id +
    * hashed shingles). Each arriving doc is verified (exact Jaccard)
    * against its band's representatives: a match ≥ `thresh` emits a dup
    * verdict `(doc_id, keeper_id, jaccard)` and the doc is NOT added
    * (dups don't become keepers); a miss adds it as a representative.
    * Keeper preference is ARRIVAL order (the only order a stream has):
    * an out-of-order earlier-event-time twin arriving later is flagged
    * against the already-seen doc. Docs with no verdict in any band are
    * the deduped survivors.
    *
    * Bounds, mirroring the batch design at 100 TB:
    *  - state per band key expires `quietMs` past its last event in
    *    EVENT time (watermark-driven — processAllAvailable-safe), so
    *    state is the watermark horizon's bands, never the corpus;
    *  - representatives per band are capped at `capPerBand` — the
    *    streaming twin of [[graft.operators.SkewGuard.capBuckets]]:
    *    a degenerate hot band stops absorbing representatives instead
    *    of growing O(n) state (docs beyond the cap can only be flagged
    *    against the first `capPerBand` keepers; same recall trade,
    *    same rationale).
    *
    * A doc matching representatives in several bands emits one verdict
    * per band (band groups share no state); downstream reconciliation
    * is a stateless `dropDuplicates(doc_id)` / min-keeper per doc. */
  def nearDupMinhash(docs: DataFrame, watermark: String = "1 hour",
                     quietMs: Long = 60 * 60 * 1000L, thresh: Double = 0.5,
                     capPerBand: Int = 64)
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import docs.sparkSession.implicits._
    val nSeeds = 8 // 4 bands × 2 rows, as in the batch query
    val base = docs // expected columns: (doc_id long, ts timestamp, text string)
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("ts"),
        TextFunctions.hashedShingleSet(col("toks"), 3).as("hs"))
    val sigs = base.select(col("doc_id"), col("ts"), col("hs"),
      graft.functions.MinHashExpr(col("hs"), nSeeds).as("sig"))
    val bands = sigs.select(
      explode(array((0 until nSeeds / 2).map(j =>
        concat_ws(":", lit(j.toString),
          element_at(col("sig"), 2 * j + 1).cast("string"),
          element_at(col("sig"), 2 * j + 2).cast("string"))): _*)).as("bkey"),
      col("doc_id"), col("ts"), col("hs"))
      .as[(String, Long, java.sql.Timestamp, Seq[Long])]
    bands.groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Seq[Long])], (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var reps = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Double)]
            var lastMs = 0L
            // Deterministic within-batch order: event time then id.
            rows.toSeq.sortBy(r => (r._3.getTime, r._2)).foreach {
              case (_, docId, ts, hs) =>
                lastMs = math.max(lastMs, ts.getTime)
                val hsSet = hs.toSet
                val hit = reps.iterator.map { case (rid, rhs) =>
                  val inter = rhs.count(hsSet)
                  (rid, inter.toDouble / (rhs.size + hs.size - inter))
                }.find(_._2 >= thresh)
                hit match {
                  case Some((rid, j)) =>
                    // HALF_UP at 6 dp — the same rounding as the batch
                    // verify's round(...,6) (math.rint would round
                    // half-to-even and diverge on exact half-ulp ties).
                    out += ((docId, rid, BigDecimal(j)
                      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
                  case None =>
                    if (reps.size < capPerBand) reps = reps :+ ((docId, hs))
                }
            }
            state.update(reps)
            state.setTimeoutTimestamp(
              math.max(lastMs + quietMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** `flatMapGroupsWithState` with a processing-time timeout: emits a
    * final per-key summary row when the key goes idle, then expires its
    * state — the 0..n-rows-out + state-expiry half of the custom-state
    * surface ([[runningCounts]] covers the 1-row-out half). State per
    * key is one counter; expired keys cost nothing. */
  def idleKeySummaries(events: org.apache.spark.sql.Dataset[(String, Long)],
                       idleMs: Long)
      : org.apache.spark.sql.Dataset[(String, Long, Boolean)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Boolean)](
        OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (key, rows, state) =>
          if (state.hasTimedOut) {
            val total = state.getOption.getOrElse(0L)
            state.remove()
            Iterator((key, total, true)) // final summary on expiry
          } else {
            val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
            state.update(total)
            state.setTimeoutDuration(idleMs)
            Iterator((key, total, false)) // running update
          }
      }
  }

  /** Streaming twin of `q_chunk_docs`: the SAME
    * [[graft.operators.Chunker]] transform (64-token chunks at stride
    * 48, per-chunk md5 fingerprint), applied per micro-batch. Entirely
    * stateless — tokenize + sequence/explode are map-side, so the
    * operator holds NO streaming state, needs no watermark, and runs in
    * append mode; every arriving doc emits its chunk manifest exactly
    * once, with the event-time carried onto each chunk row for
    * downstream windowing. The chunk-level dedup that follows in a real
    * ingest is [[dedupWithinWatermark]] keyed on `chunk_fp`. */
  def chunkDocs(docs: DataFrame, chunkLen: Long = 64L,
                stride: Long = 48L): DataFrame =
    graft.operators.Chunker.manifest(
      docs, chunkLen, stride, passThrough = Seq("ts"))

  /** Stateless streaming boilerplate screen — the streaming twin of the
    * batch `q_boilerplate_strip` STRIP phase. The frequent-chunk set is
    * trained OFFLINE (the batch query's df ≥ dfMin aggregation — the
    * bigramScore train/score split) and compresses into one Bloom
    * filter baked into the plan as a literal. Each arriving doc is
    * chunked, probed, and reassembled entirely WITHIN ITS OWN ROW
    * (array HOFs — no explode, no per-doc aggregation), so the query
    * is map-only with ZERO streaming state: no watermark, no state
    * store, nothing to checkpoint-recover, arbitrarily parallel.
    *
    * Trade, stated plainly: a Bloom false positive strips an innocent
    * chunk at ~fpp per probe; false negatives are impossible, so KNOWN
    * boilerplate always goes. Exactness needs the batch anti-join —
    * this screen is the cheap in-flight pass, sized by choosing fpp at
    * build time. `bloom` is [[graft.functions.BloomBuildAgg]]'s output
    * over the trained chunk hash60 set. */
  def boilerplateScreen(docs: DataFrame, bloom: Array[Byte],
      w: Int = graft.queries.PipelineQueries.boilerChunkW): DataFrame = {
    val probe = (c: Column) =>
      graft.functions.BloomMightContain(lit(bloom), TextFunctions.hash60(c))
    docs // expected columns: (doc_id long, ts timestamp, text string)
      .select(col("doc_id"), col("ts"), TextFunctions.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .withColumn("chunks", transform(
        sequence(lit(0), expr(s"CAST((size(t) - 1) DIV $w AS INT)")),
        i => concat_ws(" ", slice(col("t"), i * w + 1, lit(w)))))
      .withColumn("kept", filter(col("chunks"), c => !probe(c)))
      .select(col("doc_id"), col("ts"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("kept_text"))
  }

  /** Stateless streaming BPE encoder — the score half of the
    * [[graft.operators.BpeTrainer]] train/score split (the bigramScore
    * pattern): merges are trained OFFLINE on the batch corpus and the
    * ranked (left, right) list rides the plan as K chained literal
    * `replace` calls over each token's double-delimited char form —
    * identical arithmetic to the trainer's apply, so symbol counts are
    * bit-identical to the batch encode whenever the model matches
    * (StreamingSpec pins this). Entirely per-row (transform +
    * aggregate over the token array): map-only, zero streaming state,
    * no watermark. At 100 TB this is how tokenizer counts run on the
    * ingest path: the K-merge model is bytes in the plan, not a join
    * side. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (a, b) =>
      require(!a.contains("|") && !b.contains("|"),
        s"merge operands must be delimiter-free: ($a,$b)") }
    val encoded = (t: Column) => {
      val rep0 = concat(regexp_replace(t, "(.)", "\\|\\|$1"), lit("||"))
      val repK = merges.foldLeft(rep0) { case (r, (a, b)) =>
        call_function("replace", r, lit(s"|$a||$b|"), lit(s"|$a$b|"))
      }
      (size(split(repK, "\\|\\|")) - 2).cast("long")
    }
    docs // expected columns: (doc_id long, ts timestamp, text string)
      .select(col("doc_id"), col("ts"),
        filter(TextFunctions.tokens(col("text")), w => length(w) > 0).as("t"))
      .select(col("doc_id"), col("ts"),
        size(col("t")).cast("long").as("n_words"),
        aggregate(transform(col("t"), encoded), lit(0L), _ + _)
          .as("n_bpe_tokens"))
  }

  /** Streaming twin of `q_bigram_lm`'s scoring pass: every arriving doc
    * is scored against a PRE-TRAINED bigram model
    * ([[graft.queries.CorpusQueries.trainedBigramModel]]) embedded as
    * two map LITERALS in the plan — the Bloom-bit-array pattern: the
    * model is bounded by design (≤ 16 + 289 entries), so it rides in
    * the serialized plan instead of a per-batch join. The whole scorer
    * is map-side HOFs (transform → zip_with → aggregate over the token
    * array): NO streaming state, no watermark, no shuffle — append
    * mode, arbitrarily parallel. Scores are bit-identical to the batch
    * query whenever the model was trained on the same corpus
    * (StreamingSpec pins this), because the same micro-scaled integer
    * NLLs are summed with exact long arithmetic.
    *
    * This is the production split of q_bigram_lm at 100 TB: TRAIN is a
    * bounded batch agg run once per model refresh; SCORE is this
    * stateless stream. */
  def bigramScore(docs: DataFrame, vocab: Map[String, Long],
                  nllU: Map[Long, Long]): DataFrame = {
    val vTypes = graft.queries.CorpusQueries.bigramVTypes
    val vocabLit = typedLit(vocab)
    val nllLit = typedLit(nllU)
    val ids = transform(TextFunctions.tokens(col("text")),
      w => coalesce(element_at(vocabLit, w), lit(0L)))
    docs // expected columns: (doc_id long, ts timestamp, text string)
      .withColumn("ids", ids)
      .filter(size(col("ids")) >= 2)
      .withColumn("nlls", zip_with(
        slice(col("ids"), lit(1), size(col("ids")) - 1),
        slice(col("ids"), lit(2), size(col("ids")) - 1),
        (a, b) => element_at(nllLit, a * vTypes + b)))
      .select(col("doc_id"), col("ts"),
        size(col("nlls")).cast("long").as("n_bigrams"),
        aggregate(col("nlls"), lit(0L), (acc, x) => acc + x).as("nll_sum_u"))
      .withColumn("avg_nll_u",
        expr("CAST((nll_sum_u * 2 + n_bigrams) DIV (2 * n_bigrams) AS BIGINT)"))
  }

  /** Streaming ANN index INGEST — the incremental half of the IVF
    * build/probe split: new vectors arriving on a stream are assigned
    * to their nearest TRAINED cell (the model-refresh artifact
    * [[graft.queries.VectorQueries.trainedCentroidModel]] emits),
    * exactly the (dist_u, cid) argmin the batch `assignMin` computes —
    * so a downstream sink appending (vec_id, cell) rows keeps the
    * persisted cell-partitioned index (q_ann_ivf_persist) current
    * between full rebuilds. The model rides the plan as the SAME
    * two-level [[graft.functions.CentroidIndex]] the batch assign
    * uses (a codegen reference object, not a K·dim array literal —
    * the old `transform` + `array_min` literal both bloated the plan
    * and folded all K dots per row): per row the kernel quantizes to
    * µ-unit longs and runs the pruned EXACT argmin, whose
    * (dist_u, cid) tie-break IS the batch tie-break, all arithmetic
    * exact longs — so StreamingSpec pins bit-identical parity against
    * `batchAssign`. NO state, no watermark, no shuffle — append mode,
    * arbitrarily parallel, per-row cost ~2·√K dot folds at any K. */
  def annAssign(vecs: DataFrame,
      centroids: Seq[(Long, Seq[Long], Long)]): DataFrame = {
    require(centroids.nonEmpty, "annAssign needs a trained model")
    val index = graft.functions.CentroidIndex.build(
      centroids.map(c => (c._1, c._2.toArray, c._3)))
    val vf = graft.functions.VectorFunctions
    vecs // expected columns: (vec_id long, ts timestamp, embedding array<float>)
      .select(col("vec_id"), col("ts"),
        vf.microUnits(col("embedding")).as("e_u"))
      .withColumn("n2u", vf.dotLong(col("e_u"), col("e_u")))
      .withColumn("m", graft.functions.CentroidIndex.nearest(
        col("e_u"), col("n2u"), index))
      .select(col("vec_id"), col("ts"),
        col("m.cid").as("cid"), col("m.dist_u").as("dist_u"))
  }

  /** CDC upsert compaction — the streaming twin of the batch
    * `q_merge_upsert` shape. Merges one micro-batch of keyed change
    * rows (`op` ∈ U/N/D, a unique per-key `seq`) into the accumulated
    * target: HIGHEST sequence wins per key. A winning delete is
    * RETAINED as a tombstone row, not dropped — dropping it would let
    * an out-of-order older update in a LATER batch resurrect the key
    * (no newer row left in the target to outrank it); the
    * KernelPropertySpec fold-equivalence property is exactly the one
    * that fails without the tombstone. Read the live view with
    * [[upsertRead]]; age tombstones out only once the log's reorder
    * horizon has passed (the same retention reasoning as a watermark).
    *
    * This is the pure merge expression a `foreachBatch` sink runs per
    * micro-batch (the production shape: Delta/Iceberg MERGE does the
    * same winner-per-key resolution against the table); one hash
    * shuffle on the key, no join build side, AQE-skew-splittable. At
    * 100 TB the target is a key-partitioned table and the window runs
    * per key-bucket, not driver-held. */
  def upsertCompact(target: DataFrame, batch: DataFrame, key: String,
      seq: String): DataFrame =
    target.unionByName(batch)
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(key).orderBy(col(seq).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")

  /** The live (tombstone-free) view of an [[upsertCompact]] target. */
  def upsertRead(target: DataFrame, op: String = "op"): DataFrame =
    target.filter(col(op) =!= "D")

  /** Streaming twin of the batch q_drift_tvd monitor: per tumbling
    * window, bucket the value column into `refSharesU.length`
    * equi-width cells (integer arithmetic, same form as the batch
    * query) and emit the total-variation distance against a REFERENCE
    * share vector (micro-units) that broadcasts as plan literals —
    * the "alert when this hour's distribution drifts off the trained
    * corpus profile" shape. ONE windowed aggregation whose state is
    * `#buckets` conditional counters per open window (bounded by the
    * watermark), not a row buffer; TVD is a pure projection over the
    * closed window's counters. */
  def driftMonitor(events: DataFrame, tsCol: String, valueCol: String,
      refSharesU: Seq[Long], vmaxU: Long, vminU: Long = 0L,
      windowDur: String = "1 hour",
      watermark: String = "1 hour"): DataFrame = {
    val nb = refSharesU.length
    // Buckets anchored at [vminU, vmaxU] — an offset-heavy value range
    // would otherwise collapse into the top buckets (same fix as the
    // batch q_drift_tvd).
    val bucket = expr(s"least(greatest(((CAST(round($valueCol * 100) AS " +
      s"BIGINT) - $vminU) * $nb) DIV ${vmaxU - vminU + 1}, 0), ${nb - 1})")
    val countCols = (0 until nb).map(b =>
      sum(when(col("_b") === b, 1L).otherwise(0L)).as(s"c$b"))
    val counts = events.withWatermark(tsCol, watermark)
      .withColumn("_b", bucket)
      .groupBy(window(col(tsCol), windowDur))
      .agg(countCols.head, countCols.tail: _*)
    val tot = (0 until nb).map(b => col(s"c$b")).reduce(_ + _)
    val tvdTerms = (0 until nb).map { b =>
      val qU = expr(graft.queries.OracleSql.shareUSpark(s"c$b", "_tot"))
      abs(qU - lit(refSharesU(b)))
    }
    counts.withColumn("_tot", tot)
      .select(col("window.start").as("win_start"),
        col("_tot").as("n_events"),
        (tvdTerms.reduce(_ + _) / lit(2L)).cast("long").as("tvd_u"))
  }

  /** Streaming per-source quota admission — the streaming twin of
    * `q_mix_manifest`'s quota fill: each source admits at most `quota`
    * docs across the whole stream, then drops the rest. The batch twin
    * fills its quota by weighted sampling key; a stream cannot rank
    * what it has not yet seen, so the streaming form admits in arrival
    * order — the standard online relaxation of a quota'd mix, used as
    * the admission-control stage in front of an ingest pipeline.
    * State per key is ONE counter, so total state is bounded by
    * #sources regardless of stream length — no watermark needed, and
    * a source that exceeded its quota costs one long forever rather
    * than a growing buffer. Emits (source, doc_id, admit_idx) for
    * admitted docs only, admit_idx contiguous from 1 per source.
    */
  def quotaFill(docs: org.apache.spark.sql.Dataset[(Long, String)],
                quota: Long)
      : org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (source, rows, state) =>
          var n = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[(String, Long, Long)]
          rows.foreach { case (docId, _) =>
            if (n < quota) { n += 1; out += ((source, docId, n)) }
          }
          state.update(n)
          out.result().iterator
      }
  }
}
