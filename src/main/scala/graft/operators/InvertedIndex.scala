package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Inverted index: `(word, docId)` pairs → `word → sorted distinct doc
  * list`.
  *
  * Reference semantics: reducer folds values into a `HashSet` then
  * comma-joins (`/root/reference/trace-insertindex-job/src/main/java/org/
  * example/TraceInsertIndexReducer.java:132-145`). The reference's posting
  * order is HashSet iteration order (nondeterministic); we sort the
  * posting list — a documented semantic improvement that makes output
  * deterministic and oracle-checkable (SURVEY §7.4).
  *
  * Scale notes:
  *   - `collect_set` does partial aggregation: per-partition sets merge
  *     map-side, so a word appearing k times in one partition ships one
  *     set entry, not k rows.
  *   - Hot keys (the reference's own `zebra`/heavy-key experiment) can
  *     still blow up a single reducer's set at 100 TB; [[saltedPostings]]
  *     is the two-phase salted variant for that regime.
  */
object InvertedIndex {

  private val javaTrimChars: String = (0 to 32).map(_.toChar).mkString

  /** Parse reference-format `word \t docId` lines, dropping malformed
    * rows. Mirrors `TraceInsertIndexMapper.java:103-115` exactly:
    * Java-trim the line (strips tabs too, so a lone "\t" is blank, not a
    * pair), drop if empty, split on the first tab, drop if no tab
    * remains. */
  def parsePairs(lines: DataFrame, textCol: String = "value"): DataFrame = {
    // Java String.trim strips EVERY char <= U+0020 (controls included),
    // not just the 6 common whitespace chars — the full 33-char set
    // keeps the "mirrors the mapper exactly" claim true for lines with
    // stray control characters at the ends (the DSv2 reader's
    // String.trim is Java-exact already).
    lines
      .select(trim(col(textCol), javaTrimChars).as("_line"))
      .filter(length(col("_line")) > 0 && col("_line").contains("\t"))
      .select(split(col("_line"), "\t", 2).getItem(0).as("word"),
        split(col("_line"), "\t", 2).getItem(1).as("doc_id"))
  }

  /** `word → "d1,d2,..."` with the posting list deduplicated and sorted. */
  def apply(pairs: DataFrame, word: String = "word", docId: String = "doc_id"): DataFrame =
    postings(pairs, col(word), col(docId))

  def postings(pairs: DataFrame, word: Column, docId: Column): DataFrame =
    pairs
      .groupBy(word.as("word"))
      .agg(concat_ws(",",
        transform(sort_array(collect_set(docId)), _.cast("string"))).as("doc_ids"))
      .orderBy("word")

  /** [[parsePairs]] with the reference's mapper counters observed
    * (`TraceInsertIndexMapper.java:105,112`): `RAW_PAIRS_IN` counts only
    * well-formed pairs — malformed lines increment only
    * `MALFORMED_LINES`, mirroring the reference exactly. `LINES_IN`
    * (total lines scanned) is a graft addition. Computed inline via
    * `Dataset.observe` during the scan, no extra pass. Read the counts
    * from the returned [[Observation]] after an action. */
  def parsePairsCounted(lines: DataFrame, textCol: String = "value")
      : (DataFrame, Observation) = {
    val obs = Observation("graft.index.parse")
    val malformed = length(col("_line")) === 0 || !col("_line").contains("\t")
    val observed = lines
      .select(trim(col(textCol), " \t\r\n\u000B\f").as("_line"))
      .observe(obs,
        count(lit(1)).as("LINES_IN"),
        sum(when(!malformed, 1L).otherwise(0L)).as("RAW_PAIRS_IN"),
        sum(when(malformed, 1L).otherwise(0L)).as("MALFORMED_LINES"))
    val parsed = observed
      .filter(!malformed)
      .select(split(col("_line"), "\t", 2).getItem(0).as("word"),
        split(col("_line"), "\t", 2).getItem(1).as("doc_id"))
    (parsed, obs)
  }

  /** [[postings]] with the reference's reducer counters observed
    * (`TraceInsertIndexReducer.java:136-138`: `KEYS_DISTINCT`,
    * `REDUCER_LIST_EMIT`, `UNIQUE_DOCIDS_OUT`). */
  def postingsCounted(pairs: DataFrame, word: Column, docId: Column)
      : (DataFrame, Observation) = {
    val obs = Observation("graft.index.reduce")
    // Metrics attach ABOVE the sort: orderBy's range-boundary sampling
    // re-executes the sort's child, so a metrics node below it would
    // double-count.
    val out = pairs
      .groupBy(word.as("word"))
      .agg(sort_array(collect_set(docId)).as("_set"))
      .orderBy("word")
      .observe(obs,
        count(lit(1)).as("KEYS_DISTINCT"),
        count(lit(1)).as("REDUCER_LIST_EMIT"),
        sum(size(col("_set"))).cast("long").as("UNIQUE_DOCIDS_OUT"))
      .select(col("word"),
        concat_ws(",", transform(col("_set"), _.cast("string"))).as("doc_ids"))
    (out, obs)
  }

  /** Two-phase salted aggregation for heavy keys: partial collect_set per
    * (word, salt), then merge — bounds any single task's set size during
    * the first (wide) phase. Use when a key's posting list exceeds what
    * one task should buffer. */
  def saltedPostings(pairs: DataFrame, word: Column, docId: Column,
                     salts: Int = 16): DataFrame =
    pairs
      .withColumn("_salt", pmod(hash(docId), lit(salts)))
      .groupBy(word.as("word"), col("_salt"))
      .agg(collect_set(docId).as("_partial"))
      .groupBy("word")
      .agg(concat_ws(",",
        transform(sort_array(array_distinct(flatten(collect_list(col("_partial"))))),
          _.cast("string"))).as("doc_ids"))
      .orderBy("word")

  /** [[saltedPostings]] with the salt count taken from a
    * [[graft.SkewAdvise.recommend]] profile of the input — the CLI's
    * advice made executable: one bounded-state pre-flight scan picks
    * nsalts = ceil(hottest-key share × shuffle partitions), then the
    * two-phase aggregation runs with exactly that fan-out. Returns the
    * result alongside the chosen count so callers (and tests) can see
    * which plan the advice selected. An unskewed input advises 1 salt:
    * the plan degenerates to the plain single-phase shape, which is the
    * correct call, not a missed optimization. */
  def saltedPostingsAdvised(pairs: DataFrame, word: Column, docId: Column,
      capacity: Int = 64): (DataFrame, Int) = {
    val salts = graft.SkewAdvise.recommend(pairs, word, capacity)
    (saltedPostings(pairs, word, docId, salts), salts)
  }
}
