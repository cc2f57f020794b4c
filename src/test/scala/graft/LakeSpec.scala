package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LakeMaintenance
import graft.sources.Tables

/** File-layout pins for the lake-maintenance band — the effects DuckDB
  * cannot see. Correctness of the DATA through each op is the oracle
  * gate (q_compact_files / q_table_stats / q_stats_prune); these tests
  * pin that compaction actually collapses the file count, that the
  * _stats sidecar stays invisible to table scans, and that the pruned
  * scan provably opens fewer files than the unpruned one.
  */
class LakeSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def base(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_lakespec_${spark.sparkContext.applicationId}_$tag"

  test("compaction collapses a fragmented layout without touching the rows") {
    val root = base("compact")
    val frag = s"$root/frag"
    Tables.documents(spark, sf)
      .repartition(16, col("doc_id"))
      .write.mode("overwrite").partitionBy("lang").parquet(frag)
    val report = LakeMaintenance.compact(spark, frag, s"$root/out", "lang",
      targetBytes = 8L * 1024 * 1024)

    val nLangs = spark.read.parquet(frag).select("lang").distinct().count()
    assert(report.filesAfter >= nLangs,
      "every partition directory must keep at least one file")
    assert(report.filesAfter <= report.filesBefore / 3,
      s"compaction did not collapse the layout: ${report.filesBefore} -> ${report.filesAfter}")

    val before = spark.read.parquet(frag)
      .orderBy("doc_id").collect().toSeq
    val after = spark.read.parquet(s"$root/out")
      .select(before.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("doc_id").collect().toSeq
    assert(after == before, "compaction must be a pure layout rewrite")
  }

  test("the _stats sidecar is invisible to table scans") {
    val root = base("sidecar")
    val table = s"$root/t"
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("source").parquet(table)
    val rowsBefore = spark.read.parquet(table).count()
    LakeMaintenance.collectStats(spark, table, "source", "n_chars")
    val again = spark.read.parquet(table)
    assert(again.count() == rowsBefore,
      "collectStats must not change what a table scan reads")
    assert(!again.columns.contains("min_v") && !again.columns.contains("max_v"),
      "stats columns leaked into the table schema")
    val statRows = spark.read.parquet(s"$table/_stats").count()
    assert(statRows == spark.read.parquet(table)
      .select("source").distinct().count(),
      "one stats row per partition value")
  }

  test("the pruned scan opens only partitions whose stats admit the range") {
    val root = base("prune")
    val table = s"$root/t"
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").partitionBy("source").parquet(table)
    LakeMaintenance.collectStats(spark, table, "source", "n_chars")

    // Threshold = the global max, so exactly the argmax partition(s)
    // qualify — guaranteed non-trivial pruning on any fixture where at
    // least one partition's max falls below the global max.
    val globalMax = docs.agg(max("n_chars")).collect()(0).getLong(0)
    val pruned = LakeMaintenance.prunedScan(
      spark, table, "source", "n_chars", lo = globalMax, hi = Long.MaxValue)
    val expected = docs.filter(col("n_chars") >= globalMax)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val got = pruned.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected, "pruning changed the answer")

    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f }
      assert(scans.nonEmpty, "expected a file scan in the plan")
      scans.map(_.metrics("numFiles").value).sum
    }
    val full = spark.read.parquet(table)
      .filter(col("n_chars") >= globalMax)
    val nFull = filesRead(full)
    val nPruned = filesRead(LakeMaintenance.prunedScan(
      spark, table, "source", "n_chars", globalMax, Long.MaxValue))
    assert(nPruned < nFull,
      s"stats pruning opened as many files as the full scan ($nPruned vs $nFull)")
  }

  test("clustered compaction bounds BOTH dimensions' per-file spans") {
    val root = base("cluster")
    val ev = Tables.events(spark, "/root/testdata/sf0.1")
      .withColumn("minute", expr("(unix_micros(ts) DIV 60000000) % 1440"))
    ev.repartition(8, col("event_id"))
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$root/frag")
    val uMax = ev.agg(max("user_id")).collect()(0).getLong(0)
    val z = graft.functions.ZOrder.zvalue(
      expr(s"user_id * 65535 DIV $uMax"), expr("minute * 65535 DIV 1439"))

    val target = 64L * 1024
    LakeMaintenance.compact(spark, s"$root/frag", s"$root/plain",
      "event_type", target)
    LakeMaintenance.compact(spark, s"$root/frag", s"$root/zed",
      "event_type", target, clusterBy = Seq(z))

    // Identical rows either way (the cluster key is derived, not stored).
    assert(spark.read.parquet(s"$root/zed").count() == ev.count())

    // The locality property itself (ZOrderSpec's measure): mean
    // per-file span over both dimensions, normalized by global span.
    val g = ev.agg(
      (max("user_id") - min("user_id")).cast("double").as("gu"),
      (max("minute") - min("minute")).cast("double").as("gm")).collect()(0)
    def spanScore(dir: String): (Double, Long) = {
      val perFile = spark.read.parquet(dir)
        .withColumn("minute", expr("(unix_micros(ts) DIV 60000000) % 1440"))
        .groupBy(input_file_name().as("f"))
        .agg(((max("user_id") - min("user_id")) / lit(g.getDouble(0)) +
          (max("minute") - min("minute")) / lit(g.getDouble(1))).as("score"))
      (perFile.agg(avg("score")).collect()(0).getDouble(0), perFile.count())
    }
    val (zScore, zFiles) = spanScore(s"$root/zed")
    val (plainScore, _) = spanScore(s"$root/plain")
    assert(zFiles > 4, s"need multiple files for spans to mean anything, got $zFiles")
    assert(zScore < plainScore * 0.8,
      s"clustered layout ($zScore) not tighter than plain compaction ($plainScore)")
  }

  test("appendWithStats keeps the sidecar identical to a full recompute") {
    val root = base("incr")
    val table = s"$root/t"
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    old.write.mode("overwrite").partitionBy("source").parquet(table)
    LakeMaintenance.collectStats(spark, table, "source", "n_chars")

    LakeMaintenance.appendWithStats(spark, table, delta, "source", "n_chars")

    val merged = spark.read.parquet(s"$table/_stats")
      .orderBy("source").collect().toSeq
    val scratch = s"$root/recompute"
    spark.read.parquet(table).write.mode("overwrite")
      .partitionBy("source").parquet(scratch)
    LakeMaintenance.collectStats(spark, scratch, "source", "n_chars")
    val recomputed = spark.read.parquet(s"$scratch/_stats")
      .orderBy("source").collect().toSeq
    assert(merged == recomputed,
      "incremental merge diverged from the from-scratch ANALYZE")

    // And the appended table still prunes correctly through the merged
    // sidecar: answers must match the plain filter over old ∪ delta.
    val globalMax = docs.agg(max("n_chars")).collect()(0).getLong(0)
    val got = LakeMaintenance.prunedScan(
        spark, table, "source", "n_chars", globalMax, Long.MaxValue)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = docs.filter(col("n_chars") >= globalMax)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected)
  }

  test("prunedScan over an impossible range reads nothing and returns nothing") {
    val root = base("prune") // reuse the table written above if present
    val table = s"$root/t"
    if (!new java.io.File(table).exists()) {
      Tables.documents(spark, sf)
        .write.mode("overwrite").partitionBy("source").parquet(table)
      LakeMaintenance.collectStats(spark, table, "source", "n_chars")
    }
    val none = LakeMaintenance.prunedScan(
      spark, table, "source", "n_chars", lo = Long.MaxValue - 1, hi = Long.MaxValue)
    assert(none.count() == 0L)
  }
}
