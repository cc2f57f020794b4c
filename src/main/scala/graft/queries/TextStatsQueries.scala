package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Text-analysis operators for LLM-data pipelines over `documents`:
  * language ID, quality scoring, token counting, document
  * fingerprinting (north-star band, SURVEY §7.1 M6).
  *
  * All pure per-row Column expressions — no shuffle at all except the
  * final presentation ORDER BY, so at 100 TB each is a single
  * map-only scan pass that Catalyst fuses into one codegen stage with
  * column pruning down to (doc_id, text).
  */
object TextStatsQueries extends QueryModule {

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "y", "las"))

  /** Marker-token language scores with a deterministic arg-max
    * (first-listed language wins ties); CJK codepoints short-circuit
    * to zh. A real lang-ID model would use char n-gram profiles — the
    * plumbing (per-row scoring, no shuffle) is identical. */
  private def langId(text: Column, toks: Column): Column = {
    // arg-max chain: en ≥ all → en; else de ≥ rest → de; else fr ≥ es → fr.
    val Seq(en, de, fr, es) =
      markers.map { case (_, ws) => TextFunctions.stopwordHits(toks, ws) }
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Shared staging + tier rules for the quality queries — ONE
    * definition (tokens staged, 6-stopword list, good/fair/poor
    * thresholds) so q_quality_score and q_quality_sample cannot
    * desynchronize from each other or their oracles. Output keeps
    * text/_norm/toks so callers derive their extra signals without
    * re-tokenizing. */
  private def qualityTiered(s: SparkSession, d: String): DataFrame = {
    val staged = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        TextFunctions.normalizeText(col("text")).as("_norm"))
      .withColumn("toks", split(col("_norm"), " "))
    val nToks = size(col("toks")).cast("long")
    val stopHits = TextFunctions.stopwordHits(col("toks"),
      Seq("the", "a", "of", "and", "to", "in"))
    staged
      .withColumn("n_tokens", nToks)
      .withColumn("stopword_ratio", round(stopHits.cast("double") / nToks, 6))
      .withColumn("quality",
        when(col("n_tokens") >= 20 && col("stopword_ratio").between(0.01, 0.6), "good")
          .when(col("n_tokens") >= 5, "fair")
          .otherwise("poor"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tokens are staged as a real projection column before any
    // multi-reference use: an inlined tokenizer expression would re-run
    // its regexes once per reference (4 marker sets here).
    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("lang"),
          langId(col("text"), col("toks")).as("pred_lang"))
        .withColumn("is_match", col("pred_lang") === col("lang"))
        .orderBy("doc_id")),

    // Heuristic quality signals: token count, mean token length,
    // stopword ratio, alphabetic-character ratio, bucketed verdict.
    "q_quality_score" -> ((s, d) =>
      qualityTiered(s, d)
        .select(col("doc_id"), col("n_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          round(length(regexp_replace(col("_norm"), " ", "")).cast("double")
            / col("n_tokens"), 6).as("avg_token_len"),
          col("stopword_ratio"),
          round(length(regexp_replace(lower(col("text")), "[^a-z]", ""))
            .cast("double") / length(col("text")), 6).as("alpha_ratio"),
          col("quality"))
        .orderBy("doc_id")),

    // Array-function surface over the token arrays (slice, distinct,
    // membership, position, reverse) — map-only, single codegen stage.
    "q_array_funcs" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          concat_ws(",", slice(col("toks"), 1, 3)).as("first3"),
          size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
          array_contains(col("toks"), "the").as("has_the"),
          element_at(reverse(col("toks")), 1).as("last_tok"),
          array_position(col("toks"), "the").as("pos_the"))
        .orderBy("doc_id")),

    // Token counting under three tokenizers: raw whitespace, a BPE-ish
    // word/punctuation regex, and the normalized pipeline tokenizer.
    "q_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
          regexp_count(col("text"), lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"))
            .cast("long").as("re_tokens"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("norm_tokens"))
        .orderBy("doc_id")),

    // Quality-weighted data mixing: the curation step that DOWNSAMPLES
    // by quality tier instead of hard-filtering — good docs keep rate
    // 1000‰, fair 300‰, poor 50‰, decided by a deterministic hash of
    // doc_id (reproducible under re-sharding and incremental growth,
    // like the train/test split). Map-only; tiers reuse
    // q_quality_score's rules exactly. Output is the kept subset with
    // its tier and mix bucket — the manifest a mixing recipe produces.
    "q_quality_sample" -> ((s, d) =>
      qualityTiered(s, d)
        .withColumn("mix_bucket", pmod(TextFunctions.hash60(
          concat(lit("mix:"), col("doc_id").cast("string"))), lit(1000L)))
        .withColumn("keep_permille",
          when(col("quality") === "good", 1000L)
            .when(col("quality") === "fair", 300L).otherwise(50L))
        .filter(col("mix_bucket") < col("keep_permille"))
        .select(col("doc_id"), col("quality"), col("mix_bucket"), col("keep_permille"))
        .orderBy("doc_id")),

    // Intra-doc repetition score (the Gopher-style corpus-quality rule:
    // heavily self-repeating documents are low-quality boilerplate):
    // fraction of duplicate 3-shingles within each doc. Map-only, no
    // shuffle — at 100 TB this is a pure scan-stage gate like the
    // other quality signals. Distinctness is over hash60 of each
    // shingle, not the shingle strings: that makes the whole stage one
    // native ShingleHashExpr pass (no shingle-string materialization,
    // no interpreted array_distinct), and the oracle hashes
    // identically, so the compare stays exact. A collision would
    // undercount by 1 in both engines alike; at ≤10³ shingles/doc the
    // 60-bit collision probability is < 10⁻¹² per doc.
    "q_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          (size(col("toks")) - 2).cast("long").as("n_shingles"),
          size(TextFunctions.hashedShingleSet(col("toks"), 3)).cast("long")
            .as("n_distinct"))
        .withColumn("dup_ratio", round(lit(1.0)
          - col("n_distinct").cast("double") / col("n_shingles"), 6))
        .withColumn("is_repetitive", col("dup_ratio") > 0.2)
        .orderBy("doc_id")),

    // Mod-p sampled k-gram fingerprint (winnowing-style): the sorted set
    // of shingle hashes ≡ 0 (mod 8), digested to one md5. Two docs share
    // sampled hashes ⇔ they share shingles — a compact sketch for
    // containment checks that needs no shuffle to compute.
    "q_doc_fingerprint" -> ((s, d) =>
      // One native pass (tokenize + shingle-hash); the distinct-shingle
      // count is over hash60 values like q_repetition's (the oracle
      // hashes identically — same collision argument), the mod-8 sample
      // filters the already-sorted-distinct hash set, and the digest is
      // md5 over the comma-joined sample. No shingle string is ever
      // materialized.
      Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          TextFunctions.hashedShingleSet(col("toks"), 3).as("hs"))
        .withColumn("sampled", filter(col("hs"), h => h % 8 === 0))
        .select(col("doc_id"),
          size(col("hs")).cast("long").as("n_shingles"),
          size(col("sampled")).cast("long").as("n_sampled"),
          md5(concat_ws(",", transform(col("sampled"), _.cast("string")))).as("fp"))
        .orderBy("doc_id")),

    // Per-source trigram diversity — distinct-n over total-n, the
    // corpus-health metric that catches template/boilerplate collapse
    // (a source whose ratio craters is emitting near-identical text;
    // the per-DOC twin is q_repetition). Totals come map-side from the
    // token-array length (no explode), the distinct count goes through
    // 8-byte hash60 fingerprints, NOT shingle strings, and the two
    // per-source aggregates are computed in SEPARATE passes joined at
    // ≤ #sources rows — a single agg mixing count(1) with
    // count_distinct would Expand-double the exploded stream (the
    // q_hll_distinct lesson). Both engines hash identically, so a
    // 60-bit collision (≈ none at any scale) subtracts the same 1 on
    // both sides. The approximate path at 100 TB is the same shape
    // with HLL over the hashes (q_hll_distinct).
    "q_ngram_diversity" -> ((s, d) => {
      def t = Tables.documents(s, d)
        .select(col("source"), TextFunctions.tokens(col("text")).as("t"))
      val totals = t.groupBy("source").agg(
        sum(greatest(size(col("t")) - 2, lit(0)).cast("long")).as("n_trigrams"))
      val distincts = t.filter(size(col("t")) >= 3)
        .select(col("source"),
          explode(TextFunctions.hashedShingleSet(col("t"), 3)).as("h"))
        .distinct()
        .groupBy("source").agg(count(lit(1)).as("n_distinct"))
      totals.join(distincts, "source")
        .withColumn("diversity",
          round(col("n_distinct").cast("double") / col("n_trigrams"), 6))
        .orderBy("source")
    })
  )

  import OracleSql._

  def oracle: Map[String, String] = {
    val markerSql = markers.map { case (lang, ws) =>
      lang -> s"len(list_filter(t, x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    }.toMap
    Map(
      "q_lang_id" ->
        s"""SELECT doc_id, lang,
           | CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           |   WHEN ${markerSql("en")} >= ${markerSql("de")} AND ${markerSql("en")} >= ${markerSql("fr")} AND ${markerSql("en")} >= ${markerSql("es")} THEN 'en'
           |   WHEN ${markerSql("de")} >= ${markerSql("fr")} AND ${markerSql("de")} >= ${markerSql("es")} THEN 'de'
           |   WHEN ${markerSql("fr")} >= ${markerSql("es")} THEN 'fr'
           |   ELSE 'es' END AS pred_lang,
           | pred_lang = lang AS is_match
           | FROM (SELECT doc_id, lang, text, ${toks("text")} AS t FROM documents)
           | ORDER BY doc_id""".stripMargin.replace("\n", ""),

      "q_quality_score" ->
        s"""SELECT doc_id, len(t)::BIGINT AS n_tokens, length(text)::BIGINT AS n_chars,
           | round(length(replace(n, ' ', ''))::DOUBLE / len(t), 6) AS avg_token_len,
           | round(len(list_filter(t, x -> x IN ('the','a','of','and','to','in')))::DOUBLE / len(t), 6) AS stopword_ratio,
           | round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE / length(text), 6) AS alpha_ratio,
           | CASE WHEN len(t) >= 20 AND round(len(list_filter(t, x -> x IN ('the','a','of','and','to','in')))::DOUBLE / len(t), 6) BETWEEN 0.01 AND 0.6 THEN 'good'
           |   WHEN len(t) >= 5 THEN 'fair' ELSE 'poor' END AS quality
           | FROM (SELECT doc_id, text, ${norm("text")} AS n, ${toks("text")} AS t FROM documents)
           | ORDER BY doc_id""".stripMargin.replace("\n", ""),

      "q_array_funcs" ->
        s"""SELECT doc_id, len(t)::BIGINT AS n_toks,
           | array_to_string(t[1:3], ',') AS first3,
           | len(list_distinct(t))::BIGINT AS n_uniq,
           | list_contains(t, 'the') AS has_the,
           | t[-1] AS last_tok,
           | coalesce(list_position(t, 'the'), 0)::BIGINT AS pos_the
           | FROM (SELECT doc_id, ${toks("text")} AS t FROM documents)
           | ORDER BY doc_id""".stripMargin.replace("\n", ""),

      "q_token_count" ->
        s"""SELECT doc_id,
           | len(string_split_regex(text, '\\s+'))::BIGINT AS ws_tokens,
           | len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS re_tokens,
           | len(${toks("text")})::BIGINT AS norm_tokens
           | FROM documents ORDER BY doc_id""".stripMargin.replace("\n", ""),

      "q_quality_sample" -> {
        val stopSql = "len(list_filter(t, x -> x IN ('the','a','of','and','to','in')))"
        s"""WITH q AS (SELECT doc_id,
           |    CASE WHEN len(t) >= 20 AND round($stopSql::DOUBLE / len(t), 6)
           |        BETWEEN 0.01 AND 0.6 THEN 'good'
           |      WHEN len(t) >= 5 THEN 'fair' ELSE 'poor' END AS quality,
           |    ${hash60("'mix:' || doc_id::VARCHAR")} % 1000 AS mix_bucket
           |   FROM (SELECT doc_id, ${toks("text")} AS t FROM documents)),
           | r AS (SELECT *, CASE quality WHEN 'good' THEN 1000
           |    WHEN 'fair' THEN 300 ELSE 50 END AS keep_permille FROM q)
           |SELECT doc_id, quality, mix_bucket, keep_permille::BIGINT AS keep_permille
           | FROM r WHERE mix_bucket < keep_permille
           | ORDER BY doc_id""".stripMargin.replace("\n", "")
      },

      "q_repetition" ->
        s"""WITH sh AS (SELECT doc_id, len(t)::BIGINT - 2 AS n_shingles,
           |  len(list_distinct(list_transform(${shingles("t", 3)},
           |    s -> ${hash60("s")})))::BIGINT AS n_distinct
           |  FROM (SELECT doc_id, ${toks("text")} AS t FROM documents)
           |  WHERE len(t) >= 3)
           |SELECT doc_id, n_shingles, n_distinct,
           | round(1.0 - n_distinct::DOUBLE / n_shingles, 6) AS dup_ratio,
           | round(1.0 - n_distinct::DOUBLE / n_shingles, 6) > 0.2 AS is_repetitive
           | FROM sh ORDER BY doc_id""".stripMargin.replace("\n", ""),

      "q_doc_fingerprint" ->
        s"""WITH base AS (SELECT doc_id,
           |   list_distinct(list_transform(
           |     list_transform(generate_series(1, len(t)-2),
           |       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
           |     s -> ${hash60("s")})) AS hs
           |  FROM (SELECT doc_id, ${toks("text")} AS t FROM documents)),
           | samp AS (SELECT doc_id, len(hs)::BIGINT AS n_shingles,
           |   list_sort(list_filter(hs, h -> h % 8 = 0)) AS sampled
           |  FROM base)
           |SELECT doc_id, n_shingles, len(sampled)::BIGINT AS n_sampled,
           | md5(coalesce(array_to_string(list_transform(sampled, x -> x::VARCHAR), ','), '')) AS fp
           | FROM samp ORDER BY doc_id""".stripMargin.replace("\n", ""),

      // Same hash60 trigram fingerprints; per-doc list_distinct then a
      // cross-doc DISTINCT, totals from the token-list length.
      "q_ngram_diversity" ->
        s"""WITH t AS (SELECT source, ${toks("text")} AS t FROM documents),
           | tot AS (SELECT source, sum(greatest(len(t) - 2, 0))::BIGINT
           |     AS n_trigrams FROM t GROUP BY source),
           | hs AS (SELECT source, unnest(list_distinct(list_transform(
           |     list_transform(generate_series(1, len(t)-2),
           |       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
           |     s -> ${hash60("s")}))) AS h
           |   FROM t WHERE len(t) >= 3),
           | d AS (SELECT source, count(DISTINCT h)::BIGINT AS n_distinct
           |   FROM hs GROUP BY source)
           |SELECT source, n_trigrams, n_distinct,
           | round(n_distinct::DOUBLE / n_trigrams, 6) AS diversity
           | FROM tot JOIN d USING (source) ORDER BY source"""
          .stripMargin.replace("\n", "")
    )
  }
}
