package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Word count: tokenize → normalize → filter → group-count.
  *
  * Semantics derived from the reference kernel
  * (`/root/reference/trace-wordcount-job/src/main/java/org/example/
  * TraceWordCountMapper.java:108-115`: whitespace split, lowercase, strip
  * `[^a-z]`, drop empties; `TraceWordCountReducer.java:115-117`: per-word
  * sum), re-expressed as a declarative DataFrame pipeline.
  *
  * Scale notes:
  *   - `groupBy.count` compiles to partial (map-side) + final
  *     HashAggregate — the reference ships NO combiner
  *     (`TraceWordCountJob.java:112`), so every `(word, 1)` pair crosses
  *     its shuffle; here only one partial count per word per partition
  *     does. At 100 TB that is the difference between shuffling ~tokens
  *     and shuffling ~|vocabulary| × partitions.
  *   - The whole map side stays inside one WholeStageCodegen span
  *     (scan → generate → project → filter → partial agg); no UDFs.
  *   - Word skew ("the") is absorbed by partial aggregation; no salting
  *     needed for a count.
  */
object WordCount {

  /** Normalized token stream: one row per kept token.
    * @param lines input with a string column `textCol`
    * @param keep  extra columns to carry alongside each token
    */
  def tokens(lines: DataFrame, textCol: String, keep: String*): DataFrame = {
    val cols = keep.map(col) :+
      regexp_replace(lower(col("_tok")), "[^a-z]", "").as("word")
    lines
      .select(keep.map(col) :+ explode(split(col(textCol), "\\s+")).as("_tok"): _*)
      .select(cols: _*)
      .filter(length(col("word")) > 0)
  }

  /** `(word, cnt)` counts, ordered by word (the reference's single-reducer
    * output contract: keys ascending). */
  def apply(lines: DataFrame, textCol: String = "value"): DataFrame =
    tokens(lines, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** [[apply]] with kernel counters observed via `Dataset.observe`
    * (SURVEY §2.4 A4; ≙ the reference's `RAW_LINES` counter,
    * `TraceSortMapper.java:117`, and the framework's MAP_OUTPUT /
    * REDUCE_INPUT_GROUPS counts the job span reads): `RAW_LINES` on the
    * scan, `WORDS_EMITTED` after normalize+filter, `KEYS_DISTINCT` on
    * the aggregated output. Counters are computed inline — no extra
    * pass, no extra shuffle. */
  def counted(lines: DataFrame, textCol: String = "value")
      : (DataFrame, Observation, Observation) = {
    val inObs = Observation("graft.wc.in")
    val outObs = Observation("graft.wc.out")
    val observed = lines.observe(inObs, count(lit(1)).as("RAW_LINES"))
    // Output metrics attach ABOVE the sort: orderBy's range-boundary
    // sampling pass re-executes the sort's child, so a metrics node
    // below it would double-count.
    val out = tokens(observed, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")
      .observe(outObs,
        count(lit(1)).as("KEYS_DISTINCT"),
        sum(col("cnt")).as("WORDS_EMITTED"))
    (out, inObs, outObs)
  }
}
