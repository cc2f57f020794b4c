package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Partitioned-dataset sink + partition pruning: a training pipeline
  * writes its corpus partitioned by split/language so downstream jobs
  * scan only their partition — the read side must show the predicate as
  * a PartitionFilter (metadata-only pruning), not a data filter. */
class PartitionedSinkSpec extends AnyFunSuite with SparkSpec {

  test("write partitioned by lang; reads prune partitions, not rows") {
    val out = Files.createTempDirectory("graft-part").resolve("docs").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.partitionBy("lang").parquet(out)

    // One directory per language.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.length == 5 && dirs.head == "lang=de")

    val pruned = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    // The lang predicate must be a partition filter (metadata pruning),
    // and must NOT appear in the row-level data filters.
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filter in:\n$plan")

    val total = Tables.documents(spark, "/root/testdata/sf0.001").count()
    val en = pruned.count()
    assert(en > 0 && en < total)
  }
}
