package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference-format `word \t doc_id` DataSourceV2
  * ([[graft.sources.TsvPairSource]]): mapper-exact parse semantics,
  * column pruning visible in the plan, malformed-line scan metric,
  * small-file packing. */
class TsvPairSourceSpec extends AnyFunSuite with SparkSpec {

  private def writeLines(lines: Seq[String], parts: Int = 2): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-tsv").resolve("pairs").toString
    lines.toDF("value").repartition(parts).write.text(dir)
    dir
  }

  test("parses well-formed pairs, drops malformed with mapper-exact semantics") {
    val dir = writeLines(Seq(
      "alpha\tdoc1", "beta\tdoc2", "alpha\tdoc3",
      "no tab here",       // malformed: no tab
      "   ",               // malformed: whitespace-only
      "\t",                // Java-trim eats the lone tab → empty → malformed
      "  gamma\tdoc4  ",   // outer trim, inner tab preserved
      "delta\tdoc5\textra" // split on FIRST tab: remainder stays in doc_id
    ))
    val rows = spark.read.format("tsvpair").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(
      ("alpha", "doc1"), ("beta", "doc2"), ("alpha", "doc3"),
      ("gamma", "doc4"), ("delta", "doc5\textra")))
  }

  test("column pruning reaches the reader: ReadSchema shows only the selected column") {
    val dir = writeLines(Seq("a\t1", "b\t2"))
    val df = spark.read.format("tsvpair").load(dir).select("word")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("word") && !plan.contains("doc_id"),
      s"doc_id not pruned:\n$plan")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    // count(*) prunes everything and still counts only well-formed pairs
    assert(spark.read.format("tsvpair").load(dir).count() == 2)
  }

  test("malformed-line count surfaces as a scan metric") {
    val dir = writeLines(Seq("a\t1", "malformed", "b\t2", "  ", "c\t3"))
    val df = spark.read.format("tsvpair").load(dir)
    df.collect()
    val metrics = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics).toMap
    assert(metrics.contains("tsvMalformedLines"), s"metric missing: ${metrics.keys}")
    assert(metrics("tsvMalformedLines").value == 2)
    assert(metrics("tsvLinesIn").value == 5)
  }

  test("hidden path COMPONENTS are excluded, not just hidden basenames") {
    // A failed/concurrent write leaves `_temporary/attempt_*/part-*`
    // whose BASENAMES look live; reading them would double-count or
    // surface uncommitted rows. Spark's file index excludes any path
    // with a hidden component — the source must match.
    val dir = writeLines(Seq("live\tdoc1", "kept\tdoc2"), parts = 1)
    val root = new java.io.File(dir)
    val tmpAttempt = new java.io.File(root, "_temporary/attempt_001")
    assert(tmpAttempt.mkdirs())
    Files.write(tmpAttempt.toPath.resolve("part-00000"),
      "uncommitted\tdocX\n".getBytes("UTF-8"))
    val dotDir = new java.io.File(root, ".staging")
    assert(dotDir.mkdirs())
    Files.write(dotDir.toPath.resolve("part-00001"),
      "staged\tdocY\n".getBytes("UTF-8"))
    val words = spark.read.format("tsvpair").load(dir)
      .collect().map(_.getString(0)).toSet
    assert(words == Set("live", "kept"), s"leaked hidden-path rows: $words")
  }

  test("small files pack into few partitions (CombineTextInputFormat semantic)") {
    val dir = writeLines((1 to 64).map(i => s"w$i\td$i"), parts = 16)
    val df = spark.read.format("tsvpair").load(dir)
    // 16 tiny part files, default 128m bin size → one packed partition.
    assert(df.rdd.getNumPartitions == 1,
      s"expected 1 packed partition, got ${df.rdd.getNumPartitions}")
    assert(df.count() == 64)
  }

  test("DSv2 write: commit publishes staged files atomically with _SUCCESS") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-tsvw").resolve("out").toString
    Seq(("alpha", "d1"), ("beta", "d2"), ("gamma", "d3"))
      .toDF("word", "doc_id").repartition(2)
      .write.format("tsvpair").mode("append").save(dir)
    val root = new java.io.File(dir)
    assert(new java.io.File(root, "_SUCCESS").exists())
    assert(!root.listFiles().exists(_.getName.startsWith("_staging")),
      "staging dir must be cleaned after commit")
    val back = spark.read.format("tsvpair").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("alpha", "d1"), ("beta", "d2"), ("gamma", "d3")))
    // Append adds; overwrite (SupportsTruncate) replaces.
    Seq(("delta", "d4")).toDF("word", "doc_id")
      .write.format("tsvpair").mode("append").save(dir)
    assert(spark.read.format("tsvpair").load(dir).count() == 4)
    Seq(("omega", "d9")).toDF("word", "doc_id")
      .write.format("tsvpair").mode("overwrite").save(dir)
    val after = spark.read.format("tsvpair").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == Set(("omega", "d9")), s"overwrite left: $after")
  }

  test("DSv2 write: a failed job aborts — no torn output, old data intact") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-tsva").resolve("out").toString
    Seq(("keep", "d0")).toDF("word", "doc_id")
      .write.format("tsvpair").mode("append").save(dir)
    // A write whose source throws mid-stream: task abort deletes its
    // staged file, job abort deletes the staging dir, and the failed
    // OVERWRITE must not have touched the committed generation
    // (truncate runs inside commit, after all tasks staged).
    val poison = (1 to 100).toDF("i")
      .select(col("i").cast("string").as("word"),
        when(col("i") === 50, expr("raise_error('planted failure')"))
          .otherwise(col("i").cast("string")).as("doc_id"))
    intercept[Exception] {
      poison.write.format("tsvpair").mode("overwrite").save(dir)
    }
    val root = new java.io.File(dir)
    assert(!root.listFiles().exists(_.getName.startsWith("_staging")),
      s"staging leaked: ${root.listFiles().map(_.getName).toSeq}")
    val back = spark.read.format("tsvpair").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("keep", "d0")),
      s"failed overwrite corrupted the committed data: $back")
  }
}
