package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.BpeTrainer
import graft.queries.StagedCache
import graft.sources.Tables

/** Vocab-scale BPE training cost curve — `runMain graft.BpeScale
  * [sfDir] [K]` (default K=256, the smallest "real vocabulary" scale:
  * 256 merges ≈ a byte-fallback tokenizer's first page of learned
  * symbols).
  *
  * The oracle gate proves the trainer's SEMANTICS at K=6 (an unrolled
  * DuckDB CTE chain; a 256-round CTE is not a feasible oracle). What
  * K=6 cannot prove is the COST SHAPE: each round is one vocab-sized
  * pair-count shuffle plus a 1-row driver argmax, so per-round cost
  * should be flat in the round number and bounded by the word-type
  * table, never the corpus. This main measures that directly: it
  * trains K rounds with [[BpeTrainer.train]]'s onRound hook and prints
  * one JSON line with the quartile medians of the per-round wall
  * times, the curve downsampled to 32 points, and a linear-trend
  * ratio (median of last quartile / median of first quartile). A
  * ratio near 1 = the driver loop is not the next wall; a growing
  * ratio would indict staged-lineage or plan-depth leaks.
  */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val words = Tables.documents(spark, sfDir)
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
      val nTypes = words.distinct().count()

      val roundSec = scala.collection.mutable.ArrayBuffer.empty[Double]
      val t0 = System.nanoTime()
      val (merges, state) =
        BpeTrainer.train(words, k, (_, ns) => roundSec += ns / 1e9)
      val totalSec = (System.nanoTime() - t0) / 1e9
      // Post-training state fact: mean symbols-per-word — the number a
      // token-budget consumer reads off the trained vocab.
      val meanSym = state
        .agg((sum(BpeTrainer.symbolCount(col("rep")) * col("cnt")) /
          sum("cnt")).as("m")).head().getDouble(0)

      def median(xs: Seq[Double]): Double = {
        val s = xs.sorted
        if (s.isEmpty) 0.0 else s(s.length / 2)
      }
      val n = roundSec.length
      val quart = (0 until 4).map { q =>
        median(roundSec.slice(n * q / 4, n * (q + 1) / 4).toSeq)
      }
      val trend = if (quart.head > 0) quart.last / quart.head else 0.0
      val stride = math.max(1, n / 32)
      val curve = roundSec.grouped(stride).map(g => median(g.toSeq)).toSeq

      def fmt(d: Double) = f"$d%.3f"
      println(s"""{"metric":"bpe_scale","sf":"$sfDir","k":$k""" +
        s""","rounds_completed":$n,"early_stop":${n < k}""" +
        s""","word_types":$nTypes,"total_sec":${fmt(totalSec)}""" +
        s""","sec_per_round_quartile_medians":[${quart.map(fmt).mkString(",")}]""" +
        s""","last_over_first_quartile":${fmt(trend)}""" +
        s""","mean_symbols_per_word":${fmt(meanSym)}""" +
        s""","curve_med_x$stride":[${curve.map(fmt).mkString(",")}]}""")
      val last = merges.takeRight(3)
        .map(m => s"${m.rank}:${m.left}+${m.right}@${m.count}").mkString(" ")
      System.err.println(s"last merges: $last")
    } finally {
      StagedCache.releaseAll()
      spark.stop()
    }
  }
}
