package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Overlapping-chunk manifest: split every document into `chunkLen`-token
  * chunks at `stride` (16-token overlap at the 64/48 defaults) — the
  * context-window prep an LLM pipeline runs before sequence packing —
  * with a per-chunk content fingerprint (md5 of the chunk's tokens) so
  * chunk-level dedup can run downstream.
  *
  * ONE definition, two execution modes: the batch query `q_chunk_docs`
  * and the streaming kernel [[graft.streaming.StreamingKernels.chunkDocs]]
  * both call this. Map-side only — one tokenize, one sequence/explode
  * ∝ output chunks, no shuffle and no state — so it runs identically
  * over a bounded scan or an unbounded micro-batch stream; at 100 TB
  * (or 100 TB/day) this is the embarrassingly-parallel shape.
  *
  * Input must expose `doc_id` and `text`; `passThrough` columns (e.g. a
  * streaming event-time) are carried onto every chunk row unchanged.
  */
object Chunker {

  def manifest(docs: DataFrame, chunkLen: Long = 64L, stride: Long = 48L,
               passThrough: Seq[String] = Nil): DataFrame = {
    val keep: Seq[Column] = passThrough.map(col)
    docs
      .select(col("doc_id") +: keep :+
        TextFunctions.tokens(col("text")).as("toks"): _*)
      .withColumn("n", size(col("toks")).cast("long"))
      .select(Seq(col("doc_id")) ++ keep ++ Seq(col("toks"), col("n"),
        posexplode(sequence(lit(0L), col("n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "start_tok"))): _*)
      .select(Seq(col("doc_id")) ++ keep ++ Seq(
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok"),
        least(lit(chunkLen), col("n") - col("start_tok")).as("chunk_tokens"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("start_tok") + 1).cast("int"),
            lit(chunkLen.toInt)))).as("chunk_fp")): _*)
  }
}
