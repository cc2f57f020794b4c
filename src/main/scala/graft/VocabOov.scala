package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Tables

/** Diagnostic: out-of-vocabulary rate as a function of vocabulary size
  * for the `q_vocab_encode` stage.
  *
  * `runMain graft.VocabOov [sfDir]` — numbers quoted in PLANS.md. The
  * oracle query pins the encode arithmetic at vocab=16 (where OOV is
  * the common case by construction); this CLI measures, per candidate
  * vocab size, the token-OCCURRENCE coverage (what fraction of the
  * corpus encodes to a real id) and the type count, answering "how big
  * must the vocab table be before the broadcast join stops being the
  * bottleneck trade" — the vocab table is broadcast in the encode plan,
  * so its size is the knob that matters at 100 TB.
  *
  * One tokenize scan builds the full frequency table once; every vocab
  * size is then a cumulative-sum read of the same ranked table — no
  * per-size rescan.
  */
object VocabOov {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sizes =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(8, 16, 24, 32, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val freq = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    // Rank words exactly as q_vocab_encode does (frequency desc, word
    // tiebreak), then a running occurrence sum: coverage at vocab size
    // v is cum(v)/total. The ranked table is vocab-sized, not
    // corpus-sized, so the single-partition window is bounded.
    val ranked = freq
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("word"))))
      .withColumn("cum", sum("cnt").over(
        Window.orderBy(col("cnt").desc, col("word"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = freq.agg(sum("cnt").as("total"), count(lit(1)).as("types"))
      .head()
    val total = totals.getLong(0)
    val types = totals.getLong(1)
    println(s"-- corpus @ $sfDir: $total token occurrences, $types types")
    val at = ranked.filter(col("rnk").isin(sizes: _*))
      .select(col("rnk").cast("long"), col("cum")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    for (v <- sizes) {
      at.get(v) match {
        case Some(cum) =>
          val oov = 1.0 - cum.toDouble / total
          println(f"vocab=$v%5d  coverage=${cum.toDouble / total}%.4f  oov=$oov%.4f")
        case None =>
          println(f"vocab=$v%5d  (>= $types types: full coverage, oov=0.0000)")
      }
    }
    spark.stop()
  }
}
