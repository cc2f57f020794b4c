package graft

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Measured evidence for the PARTITIONED-table band at corpus scale
  * (`sbt "Test/runMain graft.PartScale <sfDir>"`, typically the
  * ×1000 Inflate corpus): build the documents table as a partitioned
  * txn table, then time the four shapes the design promises —
  * (a) the hive-laid partitioned write vs the plain write (layout
  * overhead), (b) a tier-0 partition-pruned aggregate vs the same
  * aggregate over a full scan, (c) the metadata-only dropPartition,
  * (d) the partition inventory. Prints one JSON line for PLANS.md. */
object PartScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-partscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fsp = new org.apache.hadoop.fs.Path(
      s"${sys.props("java.io.tmpdir")}/graft_partscale_${System.nanoTime()}")
    val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fsp.toString

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars")

    def timed(body: => Any): (Double, Any) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // (a) write cost: plain vs partitioned create of the same rows.
    val (plainS, _) = timed(TxnLog.create(spark, s"$root/plain", docs))
    val (partS, _) = timed(
      TxnLog.createPartitioned(spark, s"$root/part", docs, Seq("lang")))
    val t = s"$root/part"
    val nFiles = TxnLog.snapshot(spark, t).size

    // (b) pruned vs full aggregate (one lang of five).
    def agg(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_chars")).head.getLong(0)
    val (fullS, fullV) = timed(agg(
      TxnLog.read(spark, t).filter(col("lang") === "de")))
    val (pruneS, pruneV) = timed(agg(
      TxnLog.readPrunedPartition(spark, t, "lang", Seq("de"))))
    require(fullV == pruneV, s"pruned read disagrees: $fullV vs $pruneV")

    // (c) metadata-only drop of one partition.
    val (dropS, r) = timed(TxnLog.dropPartition(spark, t, "lang", "zh"))
    // (d) inventory.
    val (invS, inv) = timed(
      TxnLog.partitions(spark, t).collect().map(_.toString).mkString(";"))

    println(s"""{"metric":"part_scale","sf_dir":"$sfDir","files":$nFiles,""" +
      s""""create_plain_sec":${plainS.formatted("%.1f")},""" +
      s""""create_part_sec":${partS.formatted("%.1f")},""" +
      s""""agg_full_sec":${fullS.formatted("%.2f")},""" +
      s""""agg_pruned_sec":${pruneS.formatted("%.2f")},""" +
      s""""drop_partition_sec":${dropS.formatted("%.3f")},""" +
      s""""dropped_files":${r.asInstanceOf[TxnLog.CommitResult].removed},""" +
      s""""inventory_sec":${invS.formatted("%.2f")},""" +
      s""""inventory":"$inv"}""")
    fs.delete(fsp, true)
    spark.stop()
  }
}
