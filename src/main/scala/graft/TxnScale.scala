package graft

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Measured evidence for the stats-pruned MERGE (`runMain
  * graft.TxnScale <sfDir>`): build the SAME documents table twice as a
  * txn-log table — once key-banded WITH per-file doc_id stats, once
  * WITHOUT — then time an identical narrow-key-band merge into each.
  * The pruned path's rewrite set is the touched band only; the
  * stats-less path rewrites the whole table. Prints one JSON line with
  * both timings and the rewrite file counts, so PLANS.md carries a
  * number, not a claim.
  */
object TxnScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.builder("graft-txnscale")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val bands = 16
    val bandW = maxId / bands + 1
    // The delta updates one band's keys (the "recent partition" shape).
    val delta = docs
      .filter(col("doc_id") >= (bands - 1) * bandW)
      .withColumn("n_chars", col("n_chars") + 1L)

    def build(root: String, withStats: Boolean): String = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // One append per band → per-file doc_id ranges ARE the bands.
      val first = docs.filter(col("doc_id") < bandW)
      if (withStats) TxnLog.createWithStats(spark, root, first, "doc_id")
      else TxnLog.create(spark, root, first)
      (1 until bands).foreach { b =>
        val band = docs.filter(
          col("doc_id") >= b * bandW && col("doc_id") < (b + 1) * bandW)
        if (withStats) TxnLog.appendWithStats(spark, root, band, "doc_id")
        else TxnLog.append(spark, root, band)
      }
      root
    }

    def timeMerge(root: String): (Double, Int, Long) = {
      val before = TxnLog.snapshot(spark, root).toSet
      val t0 = System.nanoTime()
      TxnLog.merge(spark, root, delta, key = "doc_id")
      val sec = (System.nanoTime() - t0) / 1e9
      val after = TxnLog.snapshot(spark, root).toSet
      val rewritten = (before -- after).size
      val rows = TxnLog.read(spark, root).count()
      (sec, rewritten, rows)
    }

    val base = s"${sys.props("java.io.tmpdir")}/graft_txnscale_${System.nanoTime()}"
    val statsRoot = build(s"$base/banded", withStats = true)
    val plainRoot = build(s"$base/plain", withStats = false)
    // Warm the JVM/parquet paths on a throwaway copy so the A/B isn't
    // first-run-biased toward whichever side runs second.
    val warmRoot = build(s"$base/warm", withStats = true)
    timeMerge(warmRoot)

    val (statsSec, statsRewrites, statsRows) = timeMerge(statsRoot)
    val (plainSec, plainRewrites, plainRows) = timeMerge(plainRoot)
    require(statsRows == plainRows, s"row drift: $statsRows vs $plainRows")
    println(
      s"""{"metric":"txn_merge_pruned","sf":"$sfDir","bands":$bands,""" +
        s""""pruned_sec":$statsSec,"pruned_rewrites":$statsRewrites,""" +
        s""""full_sec":$plainSec,"full_rewrites":$plainRewrites,""" +
        s""""rows":$statsRows}""")
    spark.stop()
  }
}
