package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.BpeTrainer
import graft.sources.Tables

/** Corpus-level training-data operations over `documents`: deterministic
  * train/valid/test splitting, per-source quality rollups, global corpus
  * statistics, TF-IDF term ranking. The ops a 100 TB pretraining
  * pipeline runs after dedup/quality filtering — all single-shuffle
  * aggregation shapes, no driver-side state.
  */
object CorpusQueries extends QueryModule {

  /** Tokens staged per doc (see PLANS.md on staging discipline). */
  // Package-open (not private): graft.HllError measures the sketch's
  // error on exactly this token stream.
  private[graft] def tokenRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), explode(col("toks")).as("word"))

  /** Efraimidis–Spirakis exponential sampling key: −ln(u)/w with
    * u = (hash60("wsample:"+id)+1)/2^60 ∈ (0,1], micro-scaled (×1e6)
    * and rounded to 6dp so an ulp of libm-ln divergence between
    * engines cannot flip a rank order (see q_sample_weighted). Ranking
    * ascending by this key draws a weighted sample without replacement
    * with inclusion skewed ∝ `weight`. Package-open: SamplingSpec pins
    * the formula against a plain-JVM model and its selection bias. */
  private[graft] def esKey(id: Column, weight: Column): Column = {
    val h = TextFunctions.hash60(concat(lit("wsample:"), id.cast("string")))
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0)
    round(-log(u) / greatest(weight, lit(1L)).cast("double") * lit(1e6), 6)
  }

  /** Bigram-model id space: top-16 corpus vocabulary (ids 1..16, count
    * desc then word — the q_vocab_encode ordering) plus OOV id 0, so
    * every bigram-count table is bounded at 17² types BY DESIGN no
    * matter the corpus size. Shared by q_bigram_lm and q_dsir_select. */
  private val BigramVocabK = 16
  private val BigramVTypes = BigramVocabK + 1
  /** Package-open: the streaming scorer keys its model map on t1·V+t2. */
  private[graft] def bigramVTypes: Int = BigramVTypes

  /** The dense-id vocabulary frame (word, id ∈ 1..16). */
  private def bigramVocab(docs: DataFrame): DataFrame = {
    val words = docs.select(explode(TextFunctions.tokens(col("text"))).as("word"))
    words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(BigramVocabK)
      .withColumn("id", row_number().over(
        Window.orderBy(col("cnt").desc, col("word"))).cast("long"))
      .select(col("word"), col("id"))
  }

  /** (doc_id, source, t1, t2) bigram id rows — map-side slice of the
    * token array + two broadcast vocab joins, OOV → 0. A def so each
    * consumer re-derives it from the scan (staging discipline). */
  private def bigramIds(docs: DataFrame, vocab: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), TextFunctions.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("source"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .join(broadcast(vocab.select(col("word").as("w1"), col("id").as("id1"))),
        Seq("w1"), "left")
      .join(broadcast(vocab.select(col("word").as("w2"), col("id").as("id2"))),
        Seq("w2"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("id1"), lit(0L)).as("t1"),
        coalesce(col("id2"), lit(0L)).as("t2"))

  /** The complete 17×17 (t1, t2) grid — a TOTAL model domain, so a
    * model trained on a subset still scores every candidate bigram
    * (unseen contexts fall back to the uniform 1/V smoothed mass). */
  private def bigramGrid(s: SparkSession): DataFrame =
    s.range(0, BigramVTypes.toLong * BigramVTypes)
      .select(expr(s"id div $BigramVTypes").as("t1"),
        (col("id") % BigramVTypes).as("t2"))

  /** Add-one-smoothed −ln P(t2|t1) over the full grid, micro-scaled to
    * a long per TYPE (≤ 289 rows) so per-doc sums are exact integers. */
  private def bigramNll(s: SparkSession, bg: DataFrame, out: String): DataFrame = {
    val c2 = bg.groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
    val c1 = c2.groupBy("t1").agg(sum(col("c12")).as("c1"))
    bigramGrid(s)
      .join(c2, Seq("t1", "t2"), "left").join(c1, Seq("t1"), "left")
      .select(col("t1"), col("t2"),
        round(log((coalesce(col("c1"), lit(0L)) + lit(BigramVTypes.toLong)).cast("double") /
          (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double")) * lit(1e6))
          .cast("long").as(out))
  }

  /** Train the bounded bigram model and collect it driver-side — the
    * ONE legitimate collect shape: both frames are bounded BY DESIGN
    * (≤ 16 vocab rows, ≤ 289 model rows) regardless of corpus size,
    * like the Bloom bit-array build. Returns (word → id, t1·17+t2 →
    * nll_u) for literal embedding into a stateless streaming scorer
    * ([[graft.streaming.StreamingKernels.bigramScore]]). */
  private[graft] def trainedBigramModel(
      s: SparkSession, d: String): (Map[String, Long], Map[Long, Long]) = {
    val docs = Tables.documents(s, d)
    val vocab = bigramVocab(docs)
    val nll = bigramNll(s, bigramIds(docs, vocab), "nll_u")
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = nll.collect()
      .map(r => (r.getLong(0) * BigramVTypes + r.getLong(1)) -> r.getLong(2)).toMap
    (v, m)
  }

  /** Per-doc Okapi BM25 scores (k1=1.2, b=0.75) for the fixed query-term
    * set — the scoring core shared by q_bm25 (top-20 report) and
    * q_hybrid_rrf's lexical arm. Scale shape: only MATCHED tokens
    * explode (the isin filter precedes the groupBy), df and the 1-row
    * corpus stats broadcast. Float discipline: per-(doc,term)
    * contributions are quantized to integer micro-units and SUMMED AS
    * LONGS (order-independent), one divide at the end. */
  private[graft] def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val queryTerms = Seq("hash", "join", "query", "dup", "zorder")
    val docs = StagedCache.persist(Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl")))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = StagedCache.persist(docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf")))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val denom = col("tf").cast("double") +
      lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl))
    tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .withColumn("cu",
        round(idf * ((col("tf").cast("double") * lit(2.2)) / denom) * lit(1e6), 0)
          .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("cu")).as("score_u"), count(lit(1)).as("n_terms_hit"))
  }

  /** The q_hll_distinct tolerance gate: an HLL++ estimate must sit
    * within `sigmas` standard errors of the exact count. Public so the
    * negative test (AggregatorSpec) can push a POISONED estimate
    * through the same predicate and prove the gate can fail — the
    * oracle side is a TRUE constant, so falsifiability must be
    * demonstrated test-side (same structure as the approx-percentile
    * rank gate). */
  def hllOk(approx: Column, exact: Column, rsd: Double, sigmas: Double = 5.0): Column =
    abs(approx.cast("double") / exact.cast("double") - 1.0) <= lit(sigmas * rsd)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HLL++ distinct counting with a falsifiable tolerance self-check —
    // the fourth sketch in the family (KMV k-min values, GK quantiles,
    // SpaceSaving heavy hitters, HLL++ cardinality). The estimate's
    // VALUE is engine-internal (like GK's), so the oracle pins the
    // GATE: |est/exact − 1| ≤ 5·rsd, with the exact side recomputed by
    // DuckDB. 100 TB shape: the sketch is one scan with 2^p registers
    // per group through the shuffle — production runs ONLY the sketch
    // column; the exact twin here is the accuracy witness, computed as
    // distinct→count (two clean partial-aggregated levels, no
    // mixed-distinct Expand pass) and joined back by a 20-row
    // broadcast.
    "q_hll_distinct" -> ((s, d) => {
      val rsd = 0.02
      val toks = tokenRows(s, d)
        .filter(length(col("word")) > 0)
        .select(col("source"), col("word"))
      val exact = toks.distinct()
        .groupBy("source").agg(count(lit(1)).as("n_distinct"))
      val approx = toks.groupBy("source")
        .agg(approx_count_distinct(col("word"), rsd).as("_est"))
      exact.join(broadcast(approx), "source")
        .select(col("source"), col("n_distinct"),
          hllOk(col("_est"), col("n_distinct"), rsd).as("approx_ok"))
        .orderBy("source")
    }),

    // Count-Min point-frequency estimates — the fifth sketch
    // ([[graft.functions.CountMinAgg]]): per-source word frequencies
    // from depth×width bounded state, with est ≥ exact structurally.
    // Because the sketch's hash family is the engine's own seeded
    // hash60, the oracle recomputes every ESTIMATE exactly (a plain
    // bucket-count join per depth row) — bit-for-bit, stronger than
    // the HLL tolerance gate. Read path stays in built-ins:
    // least(element_at(...)) over the emitted counter matrix. Plan:
    // one scan builds the 20 sketches (constant shuffle bytes per
    // group); the exact twin is the accuracy witness joined back by a
    // broadcast of the 20-row sketch table.
    "q_count_min" -> ((s, d) => {
      val depth = 3
      val width = 256
      val toksF = tokenRows(s, d)
        .filter(length(col("word")) > 0)
        .select(col("source"), col("word"))
      val exact = toksF.groupBy("source", "word")
        .agg(count(lit(1)).as("n_exact"))
      val sk = toksF.groupBy("source")
        .agg(graft.functions.CountMinAgg(col("word"), depth, width).as("cms"))
      val est = (0 until depth).map { r =>
        element_at(element_at(col("cms"), r + 1),
          ((TextFunctions.hash60(r, col("word")) % width) + 1L).cast("int"))
      }.reduce(least(_, _))
      exact.join(broadcast(sk), "source")
        .select(col("source"), col("word"), col("n_exact"),
          est.as("cms_est"), (est >= col("n_exact")).as("over_ok"))
        .orderBy("source", "word")
    }),

    // The composed end-to-end cleaning pipeline a corpus user actually
    // runs — exact dedup → quality gate → deterministic split →
    // per-split report — as ONE oracle-checked DAG built from stages
    // that are each verified standalone (q_dedup_exact,
    // q_quality_score's token gate, q_split_train_test). Plan shape:
    // one document scan, one fingerprint shuffle (dedup window), then
    // a two-level (split, source) → (split) aggregation — partial
    // combine at every level and no Expand (countDistinct alongside
    // plain aggregates would plan Catalyst's double-pass; the nested
    // groupBy is the scale-clean form).
    "q_pipeline_clean" -> ((s, d) => {
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.fingerprintExact(col("text")).as("fp"),
          TextFunctions.tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
      val keepers = staged
        .withColumn("keeper", min("doc_id").over(Window.partitionBy("fp")))
        .filter(col("doc_id") === col("keeper"))
      val good = keepers.filter(col("n_tokens") >= 20)
      val bucket = pmod(TextFunctions.hash60(
        concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
      good
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
        .groupBy("split", "source")
        .agg(count(lit(1)).as("nd"), sum("n_tokens").as("st"),
          min("doc_id").as("md"))
        .groupBy("split")
        .agg(sum("nd").as("n_docs"), sum("st").as("sum_tokens"),
          count(lit(1)).as("n_sources"), min("md").as("min_doc_id"))
        .orderBy("split")
    }),

    // Sequence-packing manifest: assign every doc a position in the
    // stream of fixed-length (2048-token) training sequences — doc
    // order is doc_id, a doc starts at global token offset cum_before,
    // in sequence seq_id at offset_in_seq. The global running sum is
    // computed the SCALABLE way: range-partition by doc_id, partition-
    // LOCAL cumulative window, then one tiny aggregation of per-
    // partition totals whose exclusive prefix broadcasts back — no
    // single-task global window over the corpus (the naive
    // Window.orderBy form serializes 100 TB through one task; here
    // only the #partitions-row prefix table is single-task). The
    // result is a pure function of doc_id order — independent of
    // partition count or sampled range boundaries — which is what the
    // DuckDB mirror (a plain ordered window) checks.
    "q_pack_sequences" -> ((s, d) => {
      val seqLen = 2048L
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
        .repartitionByRange(col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val wLocal = Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = t.withColumn("local_before",
        coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      val wPrefix = Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefixes = local.groupBy("pid").agg(sum("n_tokens").as("ptot"))
        .withColumn("prefix", coalesce(sum("ptot").over(wPrefix), lit(0L)))
        .select(col("pid"), col("prefix"))
      local.join(broadcast(prefixes), "pid")
        .withColumn("cum_before", col("local_before") + col("prefix"))
        .select(col("doc_id"), col("n_tokens"), col("cum_before"),
          expr(s"cum_before div $seqLen").as("seq_id"),
          (col("cum_before") % seqLen).as("offset_in_seq"))
        .orderBy("doc_id")
    }),

    // Deterministic hash-based 80/10/10 split: assignment is a pure
    // function of doc_id, so it is stable under re-sharding, engine
    // changes, and incremental corpus growth — the property that makes
    // a training split reproducible. No shuffle at all (map-only).
    "q_split_train_test" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          pmod(TextFunctions.hash60(concat(lit("split:"), col("doc_id").cast("string"))),
            lit(100L)).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "valid")
            .otherwise("test"))
        .orderBy("doc_id")),

    // Per-source quality rollup: the filtering report a data pipeline
    // emits per upstream feed. One shuffle on source. All outputs are
    // exact BIGINTs — means/ratios are micro-scaled integer divisions
    // ((sum * 1e6) div n) — so no float (whose accumulation order and
    // canonical form are engine-dependent) ever reaches a result hash.
    "q_quality_by_source" -> ((s, d) => {
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("is_good", (col("n_tokens") >= 20).cast("long"))
      staged.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("is_good")).as("n_good"))
        .select(col("source"), col("n_docs"), col("sum_tokens"), col("n_good"),
          expr("(sum_tokens * 1000000L) div n_docs").as("avg_tokens_micro"),
          expr("(n_good * 1000000L) div n_docs").as("good_ratio_micro"))
        .orderBy("source")
    }),

    // Global corpus statistics in one aggregation pass.
    "q_corpus_stats" -> ((s, d) =>
      tokenRows(s, d)
        .agg(count(lit(1)).as("total_tokens"),
          countDistinct(col("word")).as("vocab_size"),
          countDistinct(col("doc_id")).as("n_docs"))
        .withColumn("avg_doc_tokens",
          round(col("total_tokens").cast("double") / col("n_docs"), 6))),

    // Sketch-based distinct counting: the 100 TB replacement for exact
    // countDistinct (whose hash set holds every distinct value). The
    // KMV TypedImperativeAggregate keeps a BOUNDED k-long buffer per
    // group, partial-aggregates map-side, and ships ≤ k longs per
    // (group, partition) through the shuffle. n_exact (the expensive
    // twin) stays in the query as the accuracy witness — at production
    // scale you run only the sketch columns.
    "q_corpus_stats_sketch" -> ((s, d) => {
      val k = 128
      val hs = Tables.documents(s, d)
        .select(col("source"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        // Native per-doc sorted-distinct hash set, exploded: same
        // distinct set as hashing every shingle occurrence, with
        // within-doc duplicates already gone BEFORE the explode — fewer
        // rows into the cross-doc distinct's exchange.
        .select(col("source"),
          explode(TextFunctions.hashedShingleSet(col("toks"), 3)).as("h"))
        // Explicit distinct (partial-aggregated map-side) instead of a
        // countDistinct alongside the sketch: a mixed distinct/plain
        // aggregate would force Catalyst's Expand-based double-pass.
        // KMV over the distinct set is identical by construction.
        .distinct()
      hs.groupBy("source")
        .agg(count(lit(1)).as("n_exact"),
          graft.functions.KmvDistinctAgg(col("h"), k).as("sk"))
        .select(col("source"), col("n_exact"),
          col("sk.n_filled").as("n_filled"),
          col("sk.kth_min").as("kth_min"),
          col("sk.est").as("est_distinct"))
        .orderBy("source")
    }),

    // Deterministic stratified sample: the k docs per source with the
    // smallest content-independent hash — a reproducible uniform sample
    // (same selection on any engine, any sharding, any run), the way a
    // training pipeline samples eval/inspection subsets. One shuffle.
    "q_group_sample" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.hash60(concat(lit("sample:"), col("doc_id").cast("string")))
            .as("h"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
        .filter(col("rnk") <= 5)
        .select(col("source"), col("doc_id"), col("rnk"))
        .orderBy("source", "rnk")),

    // Weighted stratified sample — Efraimidis–Spirakis exponential
    // keys: every doc draws u ∈ (0,1] from a content-independent hash
    // and competes with key −ln(u)/w, so the k winners per source are
    // an exact weighted sample without replacement with inclusion
    // skewed ∝ w (here w = n_chars: length-proportional sampling, the
    // importance-sampling primitive a data-mixing pipeline runs).
    // Deterministic on any engine, any sharding, any run: the
    // "randomness" is the same md5-derived uniform on both sides —
    // (h+1)/2^60 is bit-identical across engines because the 60-bit
    // int→double rounding and the power-of-two scale are both IEEE —
    // and the key is micro-scaled and rounded (6dp) before ranking
    // with a doc_id tiebreak, so an ulp of libm-ln divergence cannot
    // flip an order (the q_tfidf_top_terms precedent). One shuffle
    // (the per-source window); at 100 TB the rank prunes to top-k per
    // group before anything leaves the exchange.
    "q_sample_weighted" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("ekey", esKey(col("doc_id"), col("n_chars")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("ekey"), col("doc_id"))))
        .filter(col("rnk") <= 5)
        .select(col("source"), col("doc_id"), col("n_chars"), col("ekey"),
          col("rnk"))
        .orderBy("source", "rnk")
    }),

    // Vocabulary build + token-id encoding — the "train a tokenizer,
    // encode the corpus" stage: the top-16 words by corpus frequency
    // become ids 1..16 (rank order, word tiebreak), everything else is
    // OOV id 0, and each doc reports its token count, OOV count, and
    // an order-weighted encode checksum Σ(pos+1)·id — integer-exact,
    // so a single transposed token anywhere in the corpus flips the
    // hash. Scale shape: the vocab build is a partial-agg count +
    // distributed TakeOrdered (the q_bm25 pattern — only the ≤16-row
    // top table crosses a single-partition rank window), and encoding
    // is a broadcast join: the corpus shuffles once (doc_id agg),
    // never on the word domain.
    "q_vocab_encode" -> ((s, d) => {
      val vocabSize = 16
      // Deliberately UNstaged: the vocab build and the encode each scan
      // the corpus (two tokenize passes). A/B'd against staging the
      // token arrays at ×100 — medians 5.2 (unstaged) vs 6.0 (staged),
      // min-spreads overlapping — because the native tokenize rides
      // the scan while a persist writes an input-sized cache. Two
      // cheap scans beat one corpus-sized cache at 100 TB.
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "word")))
      val top = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word")).limit(vocabSize)
      val vocab = top.withColumn("id", row_number().over(
          Window.orderBy(col("cnt").desc, col("word"))).cast("long"))
        .select(col("word"), col("id"))
      toks.join(broadcast(vocab), Seq("word"), "left")
        .withColumn("tid", coalesce(col("id"), lit(0L)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum((col("tid") === 0L).cast("long")).as("n_oov"),
          sum((col("pos") + 1) * col("tid")).as("encode_sum"))
        .orderBy("doc_id")
    }),

    // Bigram language-model perplexity scoring — the CCNet-style
    // quality filter: train add-one-smoothed bigram statistics on the
    // corpus itself, score every doc by its average per-bigram negative
    // log-likelihood (high = unusual word transitions = low-quality or
    // out-of-domain text). The id space is the q_vocab_encode top-16
    // vocabulary plus OOV id 0, so the COUNT TABLES ARE BOUNDED BY
    // DESIGN (≤ 17² bigram types) no matter the corpus size — the
    // trick that makes a trained model broadcastable at 100 TB.
    // Determinism: each bigram type's NLL is micro-scaled to an
    // integer once (ln 6dp precedent), and per-doc totals are exact
    // long sums. Plan: three cheap corpus scans (vocab count, bigram
    // count, scoring — the q_vocab_encode A/B said scans beat an
    // input-sized cache), bigrams extracted MAP-SIDE from the token
    // array (no window, no pos shuffle); the corpus shuffles once on
    // doc_id for the final report.
    "q_bigram_lm" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = bigramVocab(docs)
      def enc = bigramIds(docs, vocab)
      enc.join(broadcast(bigramNll(s, enc, "nll_u")), Seq("t1", "t2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_u")).as("nll_sum_u"))
        // Half-away integer rounding of the micro-unit mean: a µ-unit sum
        // divided by a small count lands on an exact 6-dp half-point
        // whenever sum mod n = n/2 — frequent enough that the two
        // engines' double renderings diverged by 1 ulp at sf0.1. NLL
        // sums are non-negative ((c1+V)/(c12+1) > 1 always), so the
        // positive-operand formula is exact on both engines.
        .withColumn("avg_nll_u",
          expr("CAST((nll_sum_u * 2 + n_bigrams) DIV (2 * n_bigrams) AS BIGINT)"))
        .orderBy("doc_id")
    }),

    // DSIR-style importance selection (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): train the SAME
    // bounded bigram model twice — on a designated target domain
    // (src0..src3) and on the whole corpus — and rank every candidate
    // (non-target) doc by its log-likelihood RATIO
    // Σ (nll_raw − nll_tgt); the top-k are the raw docs that look most
    // like the target domain. Both models live on the complete 17×17
    // grid, so a context the target never saw still scores (uniform
    // smoothed mass) instead of dropping the bigram. Determinism: the
    // ratio is a difference of per-TYPE micro-scaled longs, so per-doc
    // sums are exact and the top-k tiebreak (w desc, doc_id) is total.
    // Plan: ONE bounded model agg trains BOTH NLL surfaces — the raw
    // and target-domain bigram counts fall out of the same aggregate
    // (count + conditional sum over the SAME encoded pass; the
    // round-14 form re-derived `enc` per model and tokenized the
    // corpus three times — at 100 TB each pass is a full-table read).
    // Arithmetic per model is bigramNll's exactly, so the oracle hash
    // is unchanged. Total corpus passes: one model pass + one scoring
    // scan; the only corpus-sized shuffle is the per-doc groupBy, and
    // the final top-k is TakeOrderedAndProject (no global sort) — at
    // 100 TB the model tables are still 289 rows.
    "q_dsir_select" -> ((s, d) => {
      val k = 50
      val targets = Seq("src0", "src1", "src2", "src3")
      val docs = Tables.documents(s, d)
      val vocab = bigramVocab(docs)
      def enc = bigramIds(docs, vocab)
      val isTgt = col("source").isin(targets: _*)
      val c2 = enc.groupBy("t1", "t2").agg(
        count(lit(1)).as("c12_raw"),
        sum(isTgt.cast("long")).as("c12_tgt"))
      val c1 = c2.groupBy("t1").agg(
        sum(col("c12_raw")).as("c1_raw"),
        sum(col("c12_tgt")).as("c1_tgt"))
      def nllU(c1c: Column, c12c: Column) =
        round(log(
          (coalesce(c1c, lit(0L)) + lit(BigramVTypes.toLong)).cast("double") /
            (coalesce(c12c, lit(0L)) + lit(1L)).cast("double")) * lit(1e6))
          .cast("long")
      val model = bigramGrid(s)
        .join(c2, Seq("t1", "t2"), "left").join(c1, Seq("t1"), "left")
        .select(col("t1"), col("t2"),
          nllU(col("c1_raw"), col("c12_raw")).as("nll_raw_u"),
          nllU(col("c1_tgt"), col("c12_tgt")).as("nll_tgt_u"))
      enc.filter(!col("source").isin(targets: _*))
        .join(broadcast(model), Seq("t1", "t2"))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("nll_raw_u") - col("nll_tgt_u")).as("w_sum_u"))
        // Same half-point hazard as q_bigram_lm's mean, but the ratio sum
        // can be negative: sign-symmetric half-away rounding in exact
        // integer arithmetic (DIV on non-negative operands only).
        .withColumn("avg_w_u",
          expr("CAST(CASE WHEN w_sum_u >= 0" +
            " THEN (w_sum_u * 2 + n_bigrams) DIV (2 * n_bigrams)" +
            " ELSE -((-w_sum_u * 2 + n_bigrams) DIV (2 * n_bigrams))" +
            " END AS BIGINT)"))
        .orderBy(col("w_sum_u").desc, col("doc_id"))
        .limit(k)
    }),

    // Naive Bayes domain classifier — the fastText-style linear quality
    // classifier of a pretraining pipeline (class-conditional token
    // likelihoods + a prior, argmax label), trained in-engine on the
    // same bounded id space as the bigram band: top-16 unigram vocab +
    // OOV 0, so each class model is ≤ 17 rows and the TRAINED MODEL
    // BROADCASTS at 100 TB. Classes: the DSIR target domain (src0..3)
    // vs the rest. Determinism: per-id add-one-smoothed −ln P(id|cls)
    // micro-scaled to a long per TYPE (ln 6dp precedent), doc-count
    // priors micro-scaled the same way, per-doc scores exact long
    // sums; pred breaks the lo_u == 0 tie to 'rest'. Plan: vocab agg +
    // bounded count agg (34 cells) + one-row prior agg, then ONE
    // corpus-sized shuffle (the per-doc groupBy); the model and priors
    // ride broadcast/cross joins (8-byte values — narrow values may
    // ride a broadcast cross join, PLANS.md round-7).
    "q_nb_classify" -> ((s, d) => {
      val targets = Seq("src0", "src1", "src2", "src3")
      val isTgt = col("source").isin(targets: _*)
      val docs = Tables.documents(s, d)
      val vocab = bigramVocab(docs)
      def tids = docs
        .select(col("doc_id"), col("source"),
          explode(TextFunctions.tokens(col("text"))).as("word"))
        .join(broadcast(vocab), Seq("word"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("id"), lit(0L)).as("tid"))
      val counts = s.range(0, BigramVTypes.toLong).select(col("id").as("tid"))
        .join(tids.groupBy("tid").agg(
          sum(isTgt.cast("long")).as("c_tgt"),
          sum((!isTgt).cast("long")).as("c_rest")), Seq("tid"), "left")
        .select(col("tid"),
          coalesce(col("c_tgt"), lit(0L)).as("c_tgt"),
          coalesce(col("c_rest"), lit(0L)).as("c_rest"))
      def nll(c: Column, n: Column) = round(log(
        (n + lit(BigramVTypes.toLong)).cast("double") /
          (c + lit(1L)).cast("double")) * lit(1e6)).cast("long")
      val model = counts
        .crossJoin(broadcast(counts.agg(
          sum("c_tgt").as("n_tgt"), sum("c_rest").as("n_rest"))))
        .select(col("tid"),
          nll(col("c_tgt"), col("n_tgt")).as("nll_tgt_u"),
          nll(col("c_rest"), col("n_rest")).as("nll_rest_u"))
      def nllPrior(dc: Column, dAll: Column) = round(log(
        (dAll + lit(2L)).cast("double") / (dc + lit(1L)).cast("double")) *
        lit(1e6)).cast("long")
      val priors = docs.agg(
        sum(isTgt.cast("long")).as("d_tgt"),
        sum((!isTgt).cast("long")).as("d_rest"))
        .select(
          nllPrior(col("d_tgt"), col("d_tgt") + col("d_rest")).as("p_tgt_u"),
          nllPrior(col("d_rest"), col("d_tgt") + col("d_rest")).as("p_rest_u"))
      tids.join(broadcast(model), "tid")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("nll_tgt_u")).as("s_tgt"), sum(col("nll_rest_u")).as("s_rest"))
        .crossJoin(broadcast(priors))
        .withColumn("lo_u",
          (col("p_rest_u") + col("s_rest")) - (col("p_tgt_u") + col("s_tgt")))
        .withColumn("pred", when(col("lo_u") > 0, "tgt").otherwise("rest"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("lo_u"), col("pred"))
        .orderBy("doc_id")
    }),

    // Overlapping-chunk manifest (64-token chunks at stride 48) — the
    // shared [[graft.operators.Chunker]] transform, whose streaming
    // twin is StreamingKernels.chunkDocs; see Chunker for the plan
    // shape (map-side only, no shuffle before the ordered dump).
    "q_chunk_docs" -> ((s, d) =>
      graft.operators.Chunker.manifest(Tables.documents(s, d))
        .orderBy("doc_id", "chunk_idx")),

    // Chunk-level dedup — the chunker put to work: duplicated text is
    // found at CHUNK granularity (exact-duplicate docs share every
    // chunk fp; repeated passages collide across positions and docs),
    // the report is each doc's duplicated-chunk count. Exact-dedup
    // scale shape one level down: one shuffle on chunk_fp (copy
    // counts), one on doc_id (the report) — the fp domain is output
    // chunks, so both shuffles are data-linear, and no fp table is
    // collected or broadcast (unbounded domain).
    "q_chunk_dedup" -> ((s, d) => {
      val chunks = graft.operators.Chunker.manifest(Tables.documents(s, d))
        .select(col("doc_id"), col("chunk_fp"))
      val copies = chunks.groupBy("chunk_fp")
        .agg(count(lit(1)).as("n_copies"))
      chunks.join(copies, "chunk_fp")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum((col("n_copies") > 1).cast("long")).as("n_dup_chunks"))
        .orderBy("doc_id")
    }),

    // Proportional source-mixing manifest: build a fixed-size training
    // mix (120 docs) whose composition follows per-source mixing
    // weights — the "30% code / 50% web / 20% books" primitive. Tiers
    // derive deterministically from the source id (index mod 3 →
    // weight 4/2/1); each source's quota is the integer-exact
    // floor(k·w/Σw) (no floats touch the hash), and the quota is
    // filled by the Efraimidis–Spirakis key, so within a source the
    // pick is a weighted sample without replacement. Plan: one tiny
    // distinct-source aggregate broadcast back (8-byte Σw — narrow
    // values may ride a broadcast cross join; only WIDE ones need the
    // scalar-subquery form, PLANS.md round-7), one window shuffle.
    // At 100 TB the rank prunes each source to its quota before
    // anything leaves the exchange.
    "q_mix_manifest" -> ((s, d) => {
      val k = 120L
      val mod = pmod(regexp_extract(col("source"), "(\\d+)", 1).cast("long"),
        lit(3L))
      val srcW = when(mod === 0, 4L).when(mod === 1, 2L).otherwise(1L)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("w", srcW)
      val sumW = docs.select(col("source"), col("w")).distinct()
        .agg(sum("w").as("sum_w"))
      docs.crossJoin(broadcast(sumW))
        .withColumn("quota", expr(s"($k * w) div sum_w"))
        .withColumn("ekey", esKey(col("doc_id"), col("n_chars")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("ekey"), col("doc_id"))))
        .filter(col("rnk") <= col("quota"))
        .select(col("source"), col("w"), col("quota"), col("doc_id"),
          col("rnk"))
        .orderBy("source", "rnk")
    }),

    // Token-budget subset selection: stream the corpus in weighted-
    // sample order (q_sample_weighted's key, global this time) and
    // keep docs while the running token total stays under a fixed
    // budget — "draw a 12k-token training mix with inclusion ∝ doc
    // length". The global running sum is the same two-phase shape as
    // q_pack_sequences: range-partition by the sort key, partition-
    // LOCAL cumulative window, then only the #partitions-row prefix
    // table crosses a single-task window and broadcasts back — no
    // 100 TB single-task global window. The result is a pure function
    // of (ekey, doc_id) order — independent of partition count or
    // sampled range boundaries — which is what the DuckDB mirror (a
    // plain ordered window) checks.
    "q_token_budget" -> ((s, d) => {
      val budget = 12000L
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextFunctions.tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("ekey", esKey(col("doc_id"), col("n_chars")))
        .select("doc_id", "source", "n_tokens", "ekey")
        .repartitionByRange(col("ekey"), col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val wLocal = Window.partitionBy("pid").orderBy("ekey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = t.withColumn("local_before",
        coalesce(sum("n_tokens").over(wLocal), lit(0L)))
      val wPrefix = Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefixes = local.groupBy("pid").agg(sum("n_tokens").as("ptot"))
        .withColumn("prefix", coalesce(sum("ptot").over(wPrefix), lit(0L)))
        .select(col("pid"), col("prefix"))
      local.join(broadcast(prefixes), "pid")
        .withColumn("cum_before", col("local_before") + col("prefix"))
        .filter(col("cum_before") < budget)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("ekey"),
          col("cum_before"))
        .orderBy("cum_before", "doc_id")
    }),

    // Top-5 TF-IDF terms per source: tf = term count within source,
    // idf = ln(#sources / #sources containing term). Two shuffles
    // (term-level agg, source-level window) — both on bounded key
    // domains (vocabulary), independent of corpus row count.
    "q_tfidf_top_terms" -> ((s, d) => {
      // Staged: tf feeds both the score join and the df aggregation —
      // unstaged, the tokenize + explode + count pass runs once per
      // consumer (their projections defeat exchange reuse).
      val tf = StagedCache.persist(tokenRows(s, d).groupBy("source", "word")
        .agg(count(lit(1)).as("tf")))
      val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val nSources = Tables.documents(s, d)
        .agg(countDistinct(col("source")).as("n_sources"))
      tf.join(df_, "word")
        .crossJoin(broadcast(nSources))
        .withColumn("score",
          round(col("tf") * log(col("n_sources").cast("double") / col("df")), 6))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("score").desc, col("word"))))
        .filter(col("rnk") <= 5)
        .select(col("source"), col("word"), col("tf"), col("df"), col("score"), col("rnk"))
        .orderBy("source", "rnk")
    }),

    // Heavy-hitters sketch: the bounded-state twin of exact top-k term
    // counting (SpaceSaving TypedImperativeAggregate — ≤ capacity
    // entries per partition and through the merge, where an exact
    // top-k ships the whole term domain). Capacity 64 exceeds the
    // corpus vocabulary, so no eviction happens and the estimates are
    // exact with err = 0 — the regime the oracle mirrors with plain
    // GROUP BY counts (same self-check structure as the KMV sketch);
    // the eviction guarantees are asserted in SpaceSavingSpec.
    "q_topk_sketch" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .agg(graft.functions.SpaceSavingAgg(col("word"), 64, 10).as("hh"))
        .select(posexplode(col("hh")).as(Seq("i", "e")))
        .select((col("i") + 1).cast("long").as("rnk"),
          col("e.term").as("term"), col("e.est").as("est"),
          col("e.err").as("err"))
        .orderBy("rnk")),

    // BM25 retrieval scoring (Robertson/Sparck-Jones, the standard
    // Okapi form with k1=1.2, b=0.75): score every document against a
    // fixed query-term set and return the top 20 — the search primitive
    // an LLM-data pipeline uses for benchmark decontamination triage
    // and RAG-corpus audits. Scale shape: only MATCHED tokens explode
    // (the isin filter precedes the groupBy), df and the 1-row corpus
    // stats broadcast, and top-k is a distributed TakeOrdered — the
    // only single-partition window runs over the 20 surviving rows.
    // Float discipline: per-(doc,term) contributions are quantized to
    // integer micro-units and SUMMED AS LONGS (order-independent), one
    // divide at the end — a double sum across terms would hash-diverge
    // under Spark's aggregation order. Every double expression is
    // parenthesized identically in the DuckDB mirror.
    "q_bm25" -> ((s, d) =>
      bm25Scores(s, d)
        .orderBy(col("score_u").desc, col("doc_id")).limit(20)
        .withColumn("score", round(col("score_u").cast("double") / lit(1e6), 6))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("score_u").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("n_terms_hit"), col("score"), col("rnk"))
        .orderBy("rnk")),

    // BPE tokenizer training (see [[graft.operators.BpeTrainer]]): the
    // first K learned merges, frequency-weighted over the corpus word
    // table. The oracle replays the identical K rounds as an unrolled
    // CTE chain (pair-count → argmax → delimiter-replace per round) —
    // a data-DEPENDENT iterative trainer under the exact-hash gate,
    // the strongest cross-engine check in the suite: one mis-counted
    // pair or a divergent merge application reorders every later
    // round. Driver state: K (lhs, rhs) pairs — bounded at any scale.
    "q_bpe_merges" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
      val (merges, _) = BpeTrainer.train(words, bpeK)
      s.createDataFrame(merges.map(m =>
          (m.rank.toLong, m.left, m.right, m.left + m.right, m.count)))
        .toDF("merge_rank", "lhs", "rhs", "merged", "pair_cnt")
        .orderBy("merge_rank")
    }),

    // Encode the corpus with the learned merges: per-doc token counts
    // before (chars) and after (BPE symbols) — the compression audit a
    // pipeline runs to size its token budget. The word→symbol-count
    // map is the trained vocab table (|vocab| rows, broadcast); the
    // corpus-side cost is one explode + one broadcast join + one
    // per-doc aggregate.
    "q_bpe_encode" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
      val (_, trained) = BpeTrainer.train(words, bpeK)
      val nSym = trained.select(col("word"),
        BpeTrainer.symbolCount(col("rep")).as("n_sym"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .join(broadcast(nSym), Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(length(col("word")).cast("long")).as("n_chars"),
          sum("n_sym").as("n_bpe_tokens"))
        .orderBy("doc_id")
    })
  )

  /** BPE merge rounds, shared with the oracle chain below. */
  private[graft] val bpeK = 6

  /** The unrolled K-round BPE oracle: v0 is the char-delimited word
    * table; each round derives pair counts, the argmax pair (total
    * order: count desc, lhs, rhs), and the delimiter-consuming
    * replace — the EXACT mirror of BpeTrainer's round.
    *
    * Early-stop safe: a round with no pair ≥ the frequency floor
    * leaves t_i empty, and v_i passes the word state through via the
    * LEFT JOIN + coalesce below — exactly the trainer's
    * `case None => done` — so merges come out shorter and the encode
    * still reflects every merge that WAS minted. (The cross-join form
    * this replaces emptied v_i and every CTE after it.) */
  private def bpeCteChain(k: Int): String = {
    val b = new StringBuilder
    b ++= s"WITH tokw AS (SELECT unnest(${OracleSql.toks("text")}) AS word " +
      "FROM documents), "
    b ++= "v0 AS (SELECT word, count(*)::BIGINT AS cnt, " +
      "regexp_replace(word, '(.)', '||\\1', 'g') || '||' AS rep " +
      "FROM tokw WHERE word != '' GROUP BY word)"
    for (i <- 1 to k) {
      val p = s"v${i - 1}"
      b ++= s", s$i AS (SELECT cnt, " +
        s"list_filter(string_split(rep, '||'), x -> x != '') AS s FROM $p)"
      b ++= s", j$i AS (SELECT cnt, s, " +
        s"unnest(generate_series(1, len(s) - 1)) AS j FROM s$i " +
        "WHERE len(s) >= 2)"
      b ++= s", p$i AS (SELECT s[j] AS lhs, s[j+1] AS rhs, " +
        s"sum(cnt)::BIGINT AS pair_cnt FROM j$i GROUP BY 1, 2)"
      b ++= s", t$i AS (SELECT lhs, rhs, pair_cnt FROM p$i " +
        "WHERE pair_cnt >= 2 ORDER BY pair_cnt DESC, lhs, rhs LIMIT 1)"
      // LEFT JOIN ON TRUE, not a cross join: an early-stopped round
      // (t_i empty) must pass the word state through unchanged — the
      // trainer's `case None => done` — where the cross join would
      // empty v_i and every CTE after it. NULL lhs/rhs makes the
      // replace NULL; coalesce restores rep.
      b ++= s", v$i AS (SELECT word, cnt, " +
        "coalesce(replace(rep, '|' || lhs || '||' || rhs || '|', " +
        s"'|' || lhs || rhs || '|'), rep) AS rep " +
        s"FROM $p LEFT JOIN t$i ON TRUE)"
    }
    b.toString
  }

  import OracleSql._

  private val tokenRowsSql =
    s"SELECT doc_id, source, unnest(${toks("text")}) AS word FROM documents"

  def oracle: Map[String, String] = Map(
    // Tolerance self-check: the oracle recomputes the exact side and
    // asserts the gate came out TRUE (falsifiability proven test-side,
    // AggregatorSpec's poisoned-estimate case).
    "q_hll_distinct" ->
      s"""SELECT source, count(DISTINCT word)::BIGINT AS n_distinct,
         | TRUE AS approx_ok
         | FROM ($tokenRowsSql) WHERE length(word) > 0
         | GROUP BY source ORDER BY source""".stripMargin.replace("\n", ""),

    // The estimates are recomputed from first principles: cell (r, i)
    // of a Count-Min sketch is the count of tokens hashing to i under
    // seed r, so each word's estimate is the min over depth rows of
    // its bucket's total count — a bucket-count join per row.
    "q_count_min" -> {
      def bkt(r: Int, e: String) = s"${hash60Seeded(r, e)} % 256"
      s"""WITH tok AS (SELECT source, word FROM ($tokenRowsSql)
         |   WHERE length(word) > 0),
         | ex AS (SELECT source, word, count(*)::BIGINT AS n_exact
         |   FROM tok GROUP BY source, word),
         | b0 AS (SELECT source, ${bkt(0, "word")} AS bkt, count(*)::BIGINT AS c
         |   FROM tok GROUP BY source, bkt),
         | b1 AS (SELECT source, ${bkt(1, "word")} AS bkt, count(*)::BIGINT AS c
         |   FROM tok GROUP BY source, bkt),
         | b2 AS (SELECT source, ${bkt(2, "word")} AS bkt, count(*)::BIGINT AS c
         |   FROM tok GROUP BY source, bkt)
         |SELECT e.source, e.word, e.n_exact,
         | least(c0.c, c1.c, c2.c) AS cms_est,
         | least(c0.c, c1.c, c2.c) >= e.n_exact AS over_ok
         | FROM ex e
         |  JOIN b0 c0 ON c0.source = e.source AND c0.bkt = ${bkt(0, "e.word")}
         |  JOIN b1 c1 ON c1.source = e.source AND c1.bkt = ${bkt(1, "e.word")}
         |  JOIN b2 c2 ON c2.source = e.source AND c2.bkt = ${bkt(2, "e.word")}
         | ORDER BY e.source, e.word""".stripMargin.replace("\n", "")
    },

    "q_pipeline_clean" ->
      s"""WITH staged AS (SELECT doc_id, source,
         |    md5(${norm("text")}) AS fp, len(${toks("text")})::BIGINT AS n_tokens
         |   FROM documents),
         | keep AS (SELECT * FROM (SELECT *,
         |    min(doc_id) OVER (PARTITION BY fp) AS keeper FROM staged)
         |   WHERE doc_id = keeper),
         | good AS (SELECT * FROM keep WHERE n_tokens >= 20),
         | sp AS (SELECT *, CASE
         |    WHEN ${hash60("'split:' || doc_id::VARCHAR")} % 100 < 80 THEN 'train'
         |    WHEN ${hash60("'split:' || doc_id::VARCHAR")} % 100 < 90 THEN 'valid'
         |    ELSE 'test' END AS split FROM good),
         | persrc AS (SELECT split, source, count(*)::BIGINT AS nd,
         |    sum(n_tokens)::BIGINT AS st, min(doc_id) AS md
         |   FROM sp GROUP BY split, source)
         |SELECT split, sum(nd)::BIGINT AS n_docs, sum(st)::BIGINT AS sum_tokens,
         |  count(*)::BIGINT AS n_sources, min(md) AS min_doc_id
         | FROM persrc GROUP BY split ORDER BY split""".stripMargin.replace("\n", ""),

    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, len(${toks("text")})::BIGINT AS n_tokens
         |   FROM documents),
         | c AS (SELECT doc_id, n_tokens,
         |   coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |     AS cum_before FROM t)
         |SELECT doc_id, n_tokens, cum_before,
         |  cum_before // 2048 AS seq_id,
         |  cum_before % 2048 AS offset_in_seq
         | FROM c ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_split_train_test" ->
      s"""SELECT doc_id,
         | ${hash60("'split:' || doc_id::VARCHAR")} % 100 AS bucket,
         | CASE WHEN ${hash60("'split:' || doc_id::VARCHAR")} % 100 < 80 THEN 'train'
         |   WHEN ${hash60("'split:' || doc_id::VARCHAR")} % 100 < 90 THEN 'valid'
         |   ELSE 'test' END AS split
         | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_quality_by_source" ->
      s"""SELECT source, count(*)::BIGINT AS n_docs,
         | sum(n_tokens)::BIGINT AS sum_tokens,
         | sum(is_good)::BIGINT AS n_good,
         | ((sum(n_tokens)::BIGINT * 1000000) // count(*))::BIGINT AS avg_tokens_micro,
         | ((sum(is_good)::BIGINT * 1000000) // count(*))::BIGINT AS good_ratio_micro
         | FROM (SELECT source, len(${toks("text")})::BIGINT AS n_tokens,
         |        (len(${toks("text")}) >= 20)::BIGINT AS is_good FROM documents)
         | GROUP BY source ORDER BY source""".stripMargin.replace("\n", ""),

    "q_corpus_stats" ->
      s"""SELECT total_tokens, vocab_size, n_docs,
         | round(total_tokens::DOUBLE / n_docs, 6) AS avg_doc_tokens
         | FROM (SELECT count(*)::BIGINT AS total_tokens,
         |        count(DISTINCT word)::BIGINT AS vocab_size,
         |        count(DISTINCT doc_id)::BIGINT AS n_docs
         |       FROM ($tokenRowsSql))""".stripMargin.replace("\n", ""),

    "q_corpus_stats_sketch" ->
      s"""WITH tok AS (SELECT doc_id, source, ${toks("text")} AS t FROM documents),
         | sgl AS (SELECT source, unnest(${shingles("t", 3)}) AS sh
         |   FROM tok WHERE len(t) >= 3),
         | h AS (SELECT DISTINCT source, ${hash60("sh")} AS h FROM sgl),
         | r AS (SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         |    count(*) OVER (PARTITION BY source) AS n FROM h)
         |SELECT source, max(n)::BIGINT AS n_exact,
         | least(max(n), 128)::BIGINT AS n_filled,
         | max(CASE WHEN rn = least(n, 128) THEN h END)::BIGINT AS kth_min,
         | (CASE WHEN max(n) < 128 THEN max(n)
         |   ELSE round(127.0 * 1152921504606846976.0 /
         |     max(CASE WHEN rn = least(n, 128) THEN h END), 0) END)::BIGINT AS est_distinct
         | FROM r GROUP BY source ORDER BY source""".stripMargin.replace("\n", ""),

    "q_group_sample" ->
      s"""SELECT source, doc_id, rnk FROM (
         |  SELECT source, doc_id, row_number() OVER (PARTITION BY source
         |    ORDER BY ${hash60("'sample:' || doc_id::VARCHAR")}, doc_id) AS rnk
         |  FROM documents) WHERE rnk <= 5 ORDER BY source, rnk"""
        .stripMargin.replace("\n", ""),

    "q_sample_weighted" ->
      s"""WITH k AS (SELECT source, doc_id, n_chars,
         |   round(-ln((${hash60("'wsample:' || doc_id::VARCHAR")} + 1)::DOUBLE
         |     / 1152921504606846976.0) / greatest(n_chars, 1)::DOUBLE
         |     * 1000000.0, 6) AS ekey FROM documents),
         | r AS (SELECT *, row_number() OVER (PARTITION BY source
         |     ORDER BY ekey, doc_id) AS rnk FROM k)
         |SELECT source, doc_id, n_chars, ekey, rnk FROM r WHERE rnk <= 5
         | ORDER BY source, rnk""".stripMargin.replace("\n", ""),

    "q_vocab_encode" ->
      s"""WITH tok AS (SELECT doc_id, unnest(toks) AS word,
         |   unnest(generate_series(1, len(toks))) AS pos1
         |   FROM (SELECT doc_id, ${toks("text")} AS toks FROM documents)),
         | cnt AS (SELECT word, count(*)::BIGINT AS cnt FROM tok GROUP BY word),
         | top AS (SELECT word, cnt FROM cnt ORDER BY cnt DESC, word LIMIT 16),
         | voc AS (SELECT word, row_number() OVER (ORDER BY cnt DESC, word)
         |     ::BIGINT AS id FROM top),
         | enc AS (SELECT doc_id, pos1, coalesce(id, 0)::BIGINT AS tid
         |   FROM tok LEFT JOIN voc USING (word))
         |SELECT doc_id, count(*)::BIGINT AS n_tokens,
         | sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
         | sum(pos1 * tid)::BIGINT AS encode_sum
         | FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_bigram_lm" ->
      s"""WITH tok AS (SELECT doc_id, ${toks("text")} AS t FROM documents),
         | w AS (SELECT unnest(t) AS word FROM tok),
         | cnt AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY word),
         | top AS (SELECT word, cnt FROM cnt ORDER BY cnt DESC, word LIMIT 16),
         | voc AS (SELECT word, row_number() OVER (ORDER BY cnt DESC, word)
         |     ::BIGINT AS id FROM top),
         | bg0 AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |   FROM tok WHERE len(t) >= 2),
         | bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM bg0),
         | enc AS (SELECT doc_id, coalesce(v1.id, 0)::BIGINT AS t1,
         |    coalesce(v2.id, 0)::BIGINT AS t2
         |   FROM bg LEFT JOIN voc v1 ON v1.word = bg.w1
         |           LEFT JOIN voc v2 ON v2.word = bg.w2),
         | c2 AS (SELECT t1, t2, count(*)::BIGINT AS c12 FROM enc GROUP BY t1, t2),
         | c1 AS (SELECT t1, sum(c12)::BIGINT AS c1 FROM c2 GROUP BY t1),
         | nll AS (SELECT t1, t2,
         |    round(ln((c1 + 17)::DOUBLE / (c12 + 1)::DOUBLE) * 1000000.0, 0)
         |      ::BIGINT AS nll_u
         |   FROM c2 JOIN c1 USING (t1))
         |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         | sum(nll_u)::BIGINT AS nll_sum_u,
         | ((sum(nll_u) * 2 + count(*)) // (2 * count(*)))::BIGINT AS avg_nll_u
         | FROM enc JOIN nll USING (t1, t2) GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", ""),

    // Two grid-total models from the same encoded bigrams; the ratio is
    // a difference of the per-type micro-scaled NLLs, summed per doc.
    "q_dsir_select" ->
      s"""WITH tok AS (SELECT doc_id, source, ${toks("text")} AS t FROM documents),
         | w AS (SELECT unnest(t) AS word FROM tok),
         | cnt AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY word),
         | top AS (SELECT word, cnt FROM cnt ORDER BY cnt DESC, word LIMIT 16),
         | voc AS (SELECT word, row_number() OVER (ORDER BY cnt DESC, word)
         |     ::BIGINT AS id FROM top),
         | bg0 AS (SELECT doc_id, source, t,
         |    unnest(generate_series(1, len(t) - 1)) AS i
         |   FROM tok WHERE len(t) >= 2),
         | bg AS (SELECT doc_id, source, t[i] AS w1, t[i+1] AS w2 FROM bg0),
         | enc AS (SELECT doc_id, source, coalesce(v1.id, 0)::BIGINT AS t1,
         |    coalesce(v2.id, 0)::BIGINT AS t2
         |   FROM bg LEFT JOIN voc v1 ON v1.word = bg.w1
         |           LEFT JOIN voc v2 ON v2.word = bg.w2),
         | grid AS (SELECT a.i::BIGINT AS t1, b.i::BIGINT AS t2
         |   FROM (SELECT unnest(generate_series(0, 16)) AS i) a,
         |        (SELECT unnest(generate_series(0, 16)) AS i) b),
         | c2r AS (SELECT t1, t2, count(*)::BIGINT AS c12 FROM enc GROUP BY t1, t2),
         | c1r AS (SELECT t1, sum(c12)::BIGINT AS c1 FROM c2r GROUP BY t1),
         | c2t AS (SELECT t1, t2, count(*)::BIGINT AS c12 FROM enc
         |   WHERE source IN ('src0','src1','src2','src3') GROUP BY t1, t2),
         | c1t AS (SELECT t1, sum(c12)::BIGINT AS c1 FROM c2t GROUP BY t1),
         | model AS (SELECT g.t1, g.t2,
         |    round(ln((coalesce(r1.c1, 0) + 17)::DOUBLE /
         |      (coalesce(r2.c12, 0) + 1)::DOUBLE) * 1000000.0, 0)::BIGINT AS nr,
         |    round(ln((coalesce(m1.c1, 0) + 17)::DOUBLE /
         |      (coalesce(m2.c12, 0) + 1)::DOUBLE) * 1000000.0, 0)::BIGINT AS nt
         |   FROM grid g
         |    LEFT JOIN c2r r2 ON r2.t1 = g.t1 AND r2.t2 = g.t2
         |    LEFT JOIN c1r r1 ON r1.t1 = g.t1
         |    LEFT JOIN c2t m2 ON m2.t1 = g.t1 AND m2.t2 = g.t2
         |    LEFT JOIN c1t m1 ON m1.t1 = g.t1)
         |SELECT e.doc_id, e.source, count(*)::BIGINT AS n_bigrams,
         | sum(m.nr - m.nt)::BIGINT AS w_sum_u,
         | (CASE WHEN sum(m.nr - m.nt) >= 0
        |   THEN (sum(m.nr - m.nt) * 2 + count(*)) // (2 * count(*))
        |   ELSE -((-sum(m.nr - m.nt) * 2 + count(*)) // (2 * count(*)))
        |  END)::BIGINT AS avg_w_u
         | FROM enc e JOIN model m ON m.t1 = e.t1 AND m.t2 = e.t2
         | WHERE e.source NOT IN ('src0','src1','src2','src3')
         | GROUP BY e.doc_id, e.source
         | ORDER BY w_sum_u DESC, e.doc_id LIMIT 50"""
        .stripMargin.replace("\n", ""),

    // Unigram NB replayed from first principles: grid-total per-class
    // token counts, micro-scaled smoothed NLLs per id, doc-count
    // priors, exact long log-odds per doc.
    "q_nb_classify" ->
      s"""WITH tok AS (SELECT doc_id, source, unnest(${toks("text")}) AS word
         |   FROM documents),
         | cnt AS (SELECT word, count(*)::BIGINT AS cnt FROM tok GROUP BY word),
         | top AS (SELECT word, cnt FROM cnt ORDER BY cnt DESC, word LIMIT 16),
         | voc AS (SELECT word, row_number() OVER (ORDER BY cnt DESC, word)
         |     ::BIGINT AS id FROM top),
         | enc AS (SELECT doc_id, source, coalesce(id, 0)::BIGINT AS tid
         |   FROM tok LEFT JOIN voc USING (word)),
         | grid AS (SELECT unnest(generate_series(0, 16))::BIGINT AS tid),
         | cc AS (SELECT tid,
         |    sum(CASE WHEN source IN ('src0','src1','src2','src3')
         |      THEN 1 ELSE 0 END)::BIGINT AS c_tgt,
         |    sum(CASE WHEN source NOT IN ('src0','src1','src2','src3')
         |      THEN 1 ELSE 0 END)::BIGINT AS c_rest
         |   FROM enc GROUP BY tid),
         | cf AS (SELECT g.tid, coalesce(c_tgt, 0)::BIGINT AS c_tgt,
         |    coalesce(c_rest, 0)::BIGINT AS c_rest
         |   FROM grid g LEFT JOIN cc ON cc.tid = g.tid),
         | tot AS (SELECT sum(c_tgt)::BIGINT AS n_tgt,
         |    sum(c_rest)::BIGINT AS n_rest FROM cf),
         | model AS (SELECT tid,
         |    round(ln((n_tgt + 17)::DOUBLE / (c_tgt + 1)::DOUBLE)
         |      * 1000000.0, 0)::BIGINT AS nll_tgt_u,
         |    round(ln((n_rest + 17)::DOUBLE / (c_rest + 1)::DOUBLE)
         |      * 1000000.0, 0)::BIGINT AS nll_rest_u
         |   FROM cf, tot),
         | pri AS (SELECT
         |    round(ln((count(*) + 2)::DOUBLE /
         |      (sum(CASE WHEN source IN ('src0','src1','src2','src3')
         |        THEN 1 ELSE 0 END) + 1)::DOUBLE) * 1000000.0, 0)
         |      ::BIGINT AS p_tgt_u,
         |    round(ln((count(*) + 2)::DOUBLE /
         |      (sum(CASE WHEN source NOT IN ('src0','src1','src2','src3')
         |        THEN 1 ELSE 0 END) + 1)::DOUBLE) * 1000000.0, 0)
         |      ::BIGINT AS p_rest_u
         |   FROM documents)
         |SELECT e.doc_id, e.source, count(*)::BIGINT AS n_tokens,
         | ((p_rest_u + sum(nll_rest_u)) - (p_tgt_u + sum(nll_tgt_u)))
         |   ::BIGINT AS lo_u,
         | CASE WHEN ((p_rest_u + sum(nll_rest_u)) -
         |     (p_tgt_u + sum(nll_tgt_u))) > 0 THEN 'tgt' ELSE 'rest' END AS pred
         | FROM enc e JOIN model m ON m.tid = e.tid CROSS JOIN pri
         | GROUP BY e.doc_id, e.source, p_tgt_u, p_rest_u
         | ORDER BY e.doc_id"""
        .stripMargin.replace("\n", ""),

    "q_chunk_docs" ->
      s"""WITH t AS (SELECT doc_id, ${toks("text")} AS toks,
         |   len(${toks("text")})::BIGINT AS n FROM documents),
         | c AS (SELECT doc_id, toks, n,
         |   unnest(generate_series(0, n - 1, 48)) AS start_tok FROM t)
         |SELECT doc_id, (start_tok // 48)::BIGINT AS chunk_idx,
         | start_tok::BIGINT AS start_tok,
         | least(64, n - start_tok)::BIGINT AS chunk_tokens,
         | md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 64),
         |   ' ')) AS chunk_fp
         | FROM c ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", ""),

    "q_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, ${toks("text")} AS toks,
         |   len(${toks("text")})::BIGINT AS n FROM documents),
         | c AS (SELECT doc_id, toks, n,
         |   unnest(generate_series(0, n - 1, 48)) AS start_tok FROM t),
         | ch AS (SELECT doc_id,
         |   md5(array_to_string(list_slice(toks, start_tok + 1, start_tok + 64),
         |     ' ')) AS chunk_fp FROM c),
         | cp AS (SELECT chunk_fp, count(*)::BIGINT AS n_copies
         |   FROM ch GROUP BY chunk_fp)
         |SELECT doc_id, count(*)::BIGINT AS n_chunks,
         | sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
         | FROM ch JOIN cp USING (chunk_fp) GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", ""),

    "q_mix_manifest" ->
      s"""WITH docs AS (SELECT doc_id, source, n_chars,
         |   (CASE regexp_extract(source, '(\\d+)', 1)::BIGINT % 3
         |     WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END)::BIGINT AS w
         |   FROM documents),
         | sw AS (SELECT sum(w)::BIGINT AS sum_w
         |   FROM (SELECT DISTINCT source, w FROM docs)),
         | r AS (SELECT source, w, (120 * w) // sum_w AS quota, doc_id,
         |   row_number() OVER (PARTITION BY source ORDER BY
         |     round(-ln((${hash60("'wsample:' || doc_id::VARCHAR")} + 1)::DOUBLE
         |       / 1152921504606846976.0) / greatest(n_chars, 1)::DOUBLE
         |       * 1000000.0, 6), doc_id) AS rnk
         |   FROM docs CROSS JOIN sw)
         |SELECT source, w, quota, doc_id, rnk FROM r WHERE rnk <= quota
         | ORDER BY source, rnk""".stripMargin.replace("\n", ""),

    "q_token_budget" ->
      s"""WITH k AS (SELECT doc_id, source,
         |   len(${toks("text")})::BIGINT AS n_tokens,
         |   round(-ln((${hash60("'wsample:' || doc_id::VARCHAR")} + 1)::DOUBLE
         |     / 1152921504606846976.0) / greatest(n_chars, 1)::DOUBLE
         |     * 1000000.0, 6) AS ekey FROM documents),
         | c AS (SELECT *, coalesce(sum(n_tokens) OVER (ORDER BY ekey, doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
         |     AS cum_before FROM k)
         |SELECT doc_id, source, n_tokens, ekey, cum_before FROM c
         | WHERE cum_before < 12000 ORDER BY cum_before, doc_id"""
        .stripMargin.replace("\n", ""),

    "q_tfidf_top_terms" ->
      s"""WITH tf AS (SELECT source, word, count(*)::BIGINT AS tf
         |   FROM ($tokenRowsSql) GROUP BY source, word),
         | df AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
         | ns AS (SELECT count(DISTINCT source)::BIGINT AS n_sources FROM documents),
         | scored AS (SELECT source, tf.word AS word, tf, df.df AS df,
         |   round(tf * ln(n_sources::DOUBLE / df.df), 6) AS score
         |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN ns),
         | r AS (SELECT *, row_number() OVER
         |   (PARTITION BY source ORDER BY score DESC, word) AS rnk FROM scored)
         |SELECT source, word, tf, df, score, rnk FROM r WHERE rnk <= 5
         |ORDER BY source, rnk""".stripMargin.replace("\n", ""),

    "q_topk_sketch" ->
      s"""WITH w AS (SELECT unnest(${toks("text")}) AS word FROM documents),
         | f AS (SELECT word FROM w WHERE len(word) > 0),
         | c AS (SELECT word AS term, count(*)::BIGINT AS est FROM f GROUP BY word),
         | r AS (SELECT term, est, 0::BIGINT AS err,
         |   row_number() OVER (ORDER BY est DESC, term)::BIGINT AS rnk FROM c)
         |SELECT rnk, term, est, err FROM r WHERE rnk <= 10
         | ORDER BY rnk""".stripMargin.replace("\n", ""),

    "q_bm25" ->
      s"""WITH docs AS (SELECT doc_id, t, len(t)::BIGINT AS dl
         |   FROM (SELECT doc_id, ${toks("text")} AS t FROM documents)),
         | stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
         |   FROM docs),
         | tf AS (SELECT doc_id, dl, x AS term, count(*)::BIGINT AS tf
         |   FROM (SELECT doc_id, dl, unnest(t) AS x FROM docs)
         |   WHERE x IN ('hash','join','query','dup','zorder')
         |   GROUP BY 1, 2, 3),
         | df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         | c AS (SELECT doc_id,
         |   round(ln((n_docs::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5) + 1.0)
         |     * ((tf::DOUBLE * 2.2) / (tf::DOUBLE
         |       + 1.2 * (0.25 + 0.75 * (dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE)))))
         |     * 1e6, 0)::BIGINT AS cu
         |  FROM tf JOIN df USING (term) CROSS JOIN stats),
         | sc AS (SELECT doc_id, sum(cu)::BIGINT AS score_u,
         |   count(*)::BIGINT AS n_terms_hit FROM c GROUP BY doc_id),
         | top AS (SELECT * FROM sc ORDER BY score_u DESC, doc_id LIMIT 20)
         |SELECT doc_id, n_terms_hit, round(score_u::DOUBLE / 1e6, 6) AS score,
         | row_number() OVER (ORDER BY score_u DESC, doc_id)::BIGINT AS rnk
         | FROM top ORDER BY rnk""".stripMargin.replace("\n", ""),

    "q_bpe_merges" -> {
      val ranked = (1 to bpeK).map(i =>
        s"SELECT $i::BIGINT AS merge_rank, lhs, rhs, lhs || rhs AS merged, " +
          s"pair_cnt FROM t$i").mkString(" UNION ALL ")
      s"${bpeCteChain(bpeK)} SELECT * FROM ($ranked) ORDER BY merge_rank"
    },

    "q_bpe_encode" ->
      s"""${bpeCteChain(bpeK)},
         | fin AS (SELECT word,
         |    len(list_filter(string_split(rep, '||'), x -> x != ''))::BIGINT
         |      AS n_sym
         |   FROM v$bpeK),
         | dt AS (SELECT doc_id, unnest(${OracleSql.toks("text")}) AS word
         |   FROM documents)
         |SELECT doc_id, count(*)::BIGINT AS n_words,
         | sum(len(word))::BIGINT AS n_chars,
         | sum(n_sym)::BIGINT AS n_bpe_tokens
         | FROM dt JOIN fin USING (word) WHERE word != ''
         | GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", "")
  )
}
