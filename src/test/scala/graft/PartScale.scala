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

    // (f) round-15 verbs at corpus scale:
    //   dynamic overwrite — recompute ONE partition (de), replace it
    //   atomically; cost must be ∝ the partition, never the table;
    val deRepl = docs.filter(col("lang") === "de")
      .withColumn("n_chars", col("n_chars") + 1L)
    val (dynS, dynR) = timed(
      TxnLog.overwritePartitionsDynamic(spark, t, deRepl))
    //   predicate retention drop — every lang >= 'fr' partition in ONE
    //   typed-predicate metadata commit;
    val (dwS, dwR) = timed(
      TxnLog.dropPartitionsWhere(spark, t, col("lang") >= "fr"))
    //   replaceWhere on the PLAIN table — the worst case (the
    //   predicate region spreads over every file, so victim binding
    //   and the rewrite are table-scale by construction; partitioned
    //   regions should use the partition verbs above).
    val (rwS, _) = timed(TxnLog.overwriteWhere(spark, s"$root/plain",
      col("n_chars") >= 500L,
      docs.filter(col("n_chars") >= 500L)
        .withColumn("n_chars", col("n_chars") + 1L)))

    // (e) ATTACH cost vs partition CARDINALITY: the same 2M rows
    // partitioned 5 ways vs 5000 ways, then a full-scan aggregate that
    // consumes the path-attached partition column. The round-14 form
    // probed a literal map linearly (O(partitions) per row — the 5000
    // leg would pay ~1000x the per-row attach cost); the O(1)
    // hash-probe expression must hold the two walls level.
    val rows = spark.range(0, 2000000L, 1, 16)
      .select(col("id"),
        (col("id") % 5).cast("string").as("p5"),
        (col("id") % 5000).cast("string").as("p5k"))
    // Co-locate keys per task pre-write: one file per partition, not
    // tasks x partitions.
    val (build5S, _) = timed(TxnLog.createPartitioned(spark,
      s"$root/card5", rows.select("id", "p5").repartition(16, col("p5")),
      Seq("p5")))
    val (build5kS, _) = timed(TxnLog.createPartitioned(spark,
      s"$root/card5k", rows.select("id", "p5k").repartition(32, col("p5k")),
      Seq("p5k")))
    // Isolate the ATTACH cost from the file-count overhead (5000 small
    // files pay per-file scan setup regardless of attach): measure the
    // same table's scan twice — once consuming only `id` (the unused
    // partition projection prunes away) and once consuming the
    // attached partition column. Overhead = consume − scan-only.
    def attachAgg(table: String, c: String): (Double, Double, Long) = {
      val d = TxnLog.read(spark, table)
      d.agg(count(col("id"))).head.getLong(0) // warm listing/footers
      val (s0, _) = timed(d.agg(count(col("id"))).head.getLong(0))
      val (s1, v) = timed(d.agg(count(col(c)),
        sum(length(col(c)))).head.getLong(0))
      (s0, s1, v.asInstanceOf[Long])
    }
    val (scan5S, a5S, c5) = attachAgg(s"$root/card5", "p5")
    val (scan5kS, a5kS, c5k) = attachAgg(s"$root/card5k", "p5k")
    require(c5 == 2000000L && c5k == 2000000L,
      s"attach must fill every row: $c5 / $c5k")
    // A/B against the ROUND-14 form on the 5000-partition table: the
    // same scan with the partition value attached by
    // regexp_extract + element_at(typedLit(map)) — Catalyst's
    // GetMapValue probes the 5000-entry literal map LINEARLY per row.
    val legacyMap: Map[String, String] =
      (0 until 5000).map(i => i.toString -> i.toString).toMap
    val rawScan = spark.read.parquet(TxnLog.snapshot(spark, s"$root/card5k")
      .map(rel => s"$root/card5k/$rel"): _*)
    val escSeg = regexp_extract(input_file_name(), "/p5k=([^/]+)/", 1)
    val legacy = rawScan.withColumn("p5k",
      when(escSeg === "", lit(null).cast("string"))
        .otherwise(element_at(typedLit(legacyMap), escSeg)))
    legacy.agg(count(col("id"))).head.getLong(0) // warm
    val (legacyS, legacyC) = timed(legacy.agg(count(col("p5k")),
      sum(length(col("p5k")))).head.getLong(0))
    require(legacyC.asInstanceOf[Long] == 2000000L)

    // (g) round-16: SHALLOW CLONE at corpus scale. The claim: clone
    // cost is a METADATA commit (∝ entries, zero data I/O) while the
    // deep alternative (read + rewrite) pays the full table; reading
    // through the clone costs the same scan as the source; DML on the
    // clone localizes only its victims. The plain table at this point
    // carries the replaceWhere history — clone the tip.
    val cloneSrc = s"$root/plain"
    val srcRows = TxnLog.read(spark, cloneSrc).count()
    val (cloneS, cloneR) = timed(
      TxnLog.clone(spark, cloneSrc, s"$root/clone"))
    val (deepS, _) = timed(
      TxnLog.create(spark, s"$root/deepcopy", TxnLog.read(spark, cloneSrc)))
    val (srcReadS, srcSum) = timed(agg(TxnLog.read(spark, cloneSrc)))
    val (cloneReadS, cloneSum) = timed(agg(TxnLog.read(spark, s"$root/clone")))
    require(srcSum == cloneSum, s"clone read disagrees: $srcSum vs $cloneSum")
    val (cloneDmlS, cloneDmlR) = timed(
      TxnLog.delete(spark, s"$root/clone", col("lang") === "zh").get)
    require(TxnLog.read(spark, cloneSrc).count() == srcRows,
      "DML on the clone must never move source rows")

    println(s"""{"metric":"part_scale","sf_dir":"$sfDir","files":$nFiles,""" +
      s""""clone_sec":${cloneS.formatted("%.3f")},""" +
      s""""clone_entries":${cloneR.asInstanceOf[TxnLog.CommitResult].added},""" +
      s""""deep_copy_sec":${deepS.formatted("%.1f")},""" +
      s""""src_read_sec":${srcReadS.formatted("%.2f")},""" +
      s""""clone_read_sec":${cloneReadS.formatted("%.2f")},""" +
      s""""clone_delete_sec":${cloneDmlS.formatted("%.1f")},""" +
      s""""clone_delete_removed":${cloneDmlR.asInstanceOf[TxnLog.CommitResult].removed},""" +
      s""""attach_rows":2000000,""" +
      s""""scan_only_5part_sec":${scan5S.formatted("%.2f")},""" +
      s""""attach_5part_sec":${a5S.formatted("%.2f")},""" +
      s""""scan_only_5000part_sec":${scan5kS.formatted("%.2f")},""" +
      s""""attach_5000part_sec":${a5kS.formatted("%.2f")},""" +
      s""""attach_5000part_linear_probe_sec":${legacyS.formatted("%.2f")},""" +
      s""""attach_build5_sec":${build5S.formatted("%.1f")},""" +
      s""""attach_build5000_sec":${build5kS.formatted("%.1f")},""" +
      s""""create_plain_sec":${plainS.formatted("%.1f")},""" +
      s""""create_part_sec":${partS.formatted("%.1f")},""" +
      s""""agg_full_sec":${fullS.formatted("%.2f")},""" +
      s""""agg_pruned_sec":${pruneS.formatted("%.2f")},""" +
      s""""drop_partition_sec":${dropS.formatted("%.3f")},""" +
      s""""dropped_files":${r.asInstanceOf[TxnLog.CommitResult].removed},""" +
      s""""dyn_overwrite_1of4_sec":${dynS.formatted("%.1f")},""" +
      s""""dyn_overwrite_removed":${dynR.asInstanceOf[TxnLog.CommitResult].removed},""" +
      s""""drop_where_sec":${dwS.formatted("%.3f")},""" +
      s""""drop_where_removed":${dwR.asInstanceOf[TxnLog.CommitResult].removed},""" +
      s""""replace_where_plain_sec":${rwS.formatted("%.1f")},""" +
      s""""inventory_sec":${invS.formatted("%.2f")},""" +
      s""""inventory":"$inv"}""")
    fs.delete(fsp, true)
    spark.stop()
  }
}
