package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, WordCount}
import graft.sources.TextIO

/** End-to-end file-to-file runs of the three kernels through the CLI
  * (S1/S4/S5 + M4), plus observe()-counter parity (A4). */
class CliAndCountersSpec extends AnyFunSuite with SparkSpec {

  private def tmpDir(): Path = Files.createTempDirectory("graft-test")

  private def writeLines(dir: Path, name: String, ls: Seq[String]): Path = {
    val f = dir.resolve(name)
    Files.write(f, ls.asJava)
    f
  }

  private def readOut(out: Path): Seq[String] =
    Files.list(out).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq

  private val indexFixture: Seq[String] =
    (1 to 5).flatMap(i => Seq(s"apple\tdoc$i", s"banana\tdoc$i", s"cat\tdoc$i")) :+
      "zebra\tdoc6"

  test("CLI wordcount: file in, sorted key\\tcount lines out") {
    val dir = tmpDir()
    writeLines(dir, "in.txt", Seq("the quick fox", "the dog"))
    val rc = Main.run(spark, Main.Args("wordcount",
      dir.resolve("in.txt").toString, dir.resolve("out").toString))
    assert(rc == 0)
    val got = readOut(dir.resolve("out"))
    assert(got.sorted == Seq("dog\t1", "fox\t1", "quick\t1", "the\t2"))
  }

  test("CLI sort: total order with duplicates preserved") {
    val dir = tmpDir()
    val in = Seq("orange", "apple", "banana", "apple")
    writeLines(dir, "in.txt", in)
    val rc = Main.run(spark, Main.Args("sort",
      dir.resolve("in.txt").toString, dir.resolve("out").toString))
    assert(rc == 0)
    // A text sink writes one file per range partition; file name order
    // follows partition order, so concatenation IS the total order.
    val got = readOut(dir.resolve("out"))
    assert(got == in.sorted)
  }

  test("CLI insertindex: reference fixture → reference index") {
    val dir = tmpDir()
    writeLines(dir, "in.txt", indexFixture ++ Seq("", "notab"))
    val rc = Main.run(spark, Main.Args("insertindex",
      dir.resolve("in.txt").toString, dir.resolve("out").toString))
    assert(rc == 0)
    assert(readOut(dir.resolve("out")) == Seq(
      "apple\tdoc1,doc2,doc3,doc4,doc5",
      "banana\tdoc1,doc2,doc3,doc4,doc5",
      "cat\tdoc1,doc2,doc3,doc4,doc5",
      "zebra\tdoc6"))
  }

  test("CLI: output dir exists → fails (ErrorIfExists) unless --overwrite") {
    val dir = tmpDir()
    writeLines(dir, "in.txt", Seq("x"))
    val out = dir.resolve("out").toString
    assert(Main.run(spark, Main.Args("sort", dir.resolve("in.txt").toString, out)) == 0)
    assert(Main.run(spark, Main.Args("sort", dir.resolve("in.txt").toString, out)) == 1)
    assert(Main.run(spark, Main.Args("sort", dir.resolve("in.txt").toString, out,
      overwrite = true)) == 0)
  }

  test("CLI query: any named engine query runs table-dir to parquet") {
    val dir = tmpDir()
    val rc = Main.run(spark, Main.Args("query", "/root/testdata/sf0.001",
      dir.resolve("out").toString, query = Some("q_topk")))
    assert(rc == 0)
    val got = spark.read.parquet(dir.resolve("out").toString)
    assert(got.count() == 10)
    // Reproducibility manifest: row count + sigv1 of the SAME logical
    // plan a direct builder call produces.
    val manifest = new String(Files.readAllBytes(
      dir.resolve("out").resolve("_graft_manifest.json")))
    assert(manifest.contains("\"rows\": 10"))
    val expectSig = graft.observe.PlanSignature.sigv1(
      SparkEntry.queries("q_topk")(spark, "/root/testdata/sf0.001"))
    assert(manifest.contains(expectSig))
    // Parse path: positional name, unknown names rejected with the list.
    val parsed = Main.parse(Array("query", "q_topk", "/t", "/o", "--overwrite"))
    assert(parsed == Right(Main.Args("query", "/t", "/o",
      overwrite = true, query = Some("q_topk"))))
    assert(Main.parse(Array("query", "nope", "/t", "/o")).isLeft)
  }

  test("CLI sql: ad-hoc SQL over the lake catalog runs to parquet") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", "/root/testdata")
    val dir = tmpDir()
    val sql = "SELECT l_returnflag, count(*) AS n " +
      "FROM graft.`sf0.001`.lineitem GROUP BY l_returnflag"
    val rc = Main.run(spark,
      Main.Args("sql", sql, dir.resolve("out").toString))
    assert(rc == 0)
    val got = spark.read.parquet(dir.resolve("out").toString)
    assert(got.count() == 3)
    val manifest = new String(Files.readAllBytes(
      dir.resolve("out").resolve("_graft_manifest.json")))
    assert(manifest.contains("\"rows\": 3") && manifest.contains("plan_sig"))
  }

  test("CLI quality: checks + profile written, failing check reported, job rc 0") {
    val dir = tmpDir()
    val out = dir.resolve("out").toString
    val rc = Main.run(spark, Main.Args("quality", "/root/testdata/sf0.001", out))
    assert(rc == 0) // a failing CHECK is a result, not a job failure
    val checks = spark.read.parquet(s"$out/checks")
    assert(checks.columns.toSeq.sorted ==
      Seq("check_name", "metric", "passed"))
    // The by-construction-failing uniqueness check surfaces as data.
    val failed = checks.filter(!org.apache.spark.sql.functions.col("passed"))
      .collect().map(_.getString(0)).toSet
    assert(failed == Set("customer.unique.c_mktsegment"))
    val profile = spark.read.parquet(s"$out/profile")
    assert(profile.count() == 5)
    assert(profile.columns.contains("n_distinct_est"))
    // ErrorIfExists honored; --overwrite unlocks.
    assert(Main.run(spark, Main.Args("quality", "/root/testdata/sf0.001", out)) == 1)
    assert(Main.run(spark, Main.Args("quality", "/root/testdata/sf0.001", out,
      overwrite = true)) == 0)
  }

  test("CLI tsvpair: reference-format lines → parquet pair table, malformed dropped") {
    val dir = tmpDir()
    Files.createDirectories(dir.resolve("in"))
    Files.write(dir.resolve("in/part-0"),
      (indexFixture ++ Seq("notab", "   ")).asJava)
    val out = dir.resolve("out").toString
    val rc = Main.run(spark, Main.Args("tsvpair", dir.resolve("in").toString, out))
    assert(rc == 0)
    val got = spark.read.parquet(out)
    assert(got.columns.toSeq == Seq("word", "doc_id"))
    assert(got.count() == indexFixture.size) // the 2 malformed lines dropped
    // ErrorIfExists honored like the kernels; --overwrite unlocks.
    assert(Main.run(spark, Main.Args("tsvpair", dir.resolve("in").toString, out)) == 1)
    assert(Main.run(spark, Main.Args("tsvpair", dir.resolve("in").toString, out,
      overwrite = true)) == 0)
  }

  test("CLI inflate: factor-2 inflation doubles fact tables, keeps dims fixed") {
    val dir = tmpDir()
    val in = "/root/testdata/sf0.001"
    val out = dir.resolve("inflated").toString
    val rc = Main.run(spark, Main.Args("inflate", in, out, factor = 2))
    assert(rc == 0)
    def cnt(root: String, t: String): Long =
      spark.read.parquet(s"$root/$t.parquet").count()
    for (t <- Seq("documents", "lineitem", "events", "embeddings"))
      assert(cnt(out, t) == 2 * cnt(in, t), s"$t not doubled")
    // Dimension tables stay fixed (TPC-H scaling; broadcast must stay broadcast).
    for (t <- Seq("nation", "region"))
      assert(cnt(out, t) == cnt(in, t), s"$t should be unchanged")
    // Parse path: --factor is inflate-only and must be positive.
    assert(Main.parse(Array("inflate", "/t", "/o", "--factor", "3"))
      .exists(_.factor == 3))
    assert(Main.parse(Array("inflate", "/t", "/o", "--factor", "0")).isLeft)
    assert(Main.parse(Array("sort", "/t", "/o", "--factor", "2")).isLeft)
  }

  test("CLI: bad args are rejected with the reference's arg contract") {
    assert(Main.parse(Array("wordcount", "in")).isLeft)
    assert(Main.parse(Array("nope", "in", "out")).isLeft)
    assert(Main.parse(Array("sort", "in", "out", "--reducers", "0")).isLeft)
    assert(Main.parse(Array("sort", "in", "out", "--reducers", "3"))
      .exists(_.reducers == 3))
  }

  test("CLI --trace emits JSON-line spans to the file") {
    val dir = tmpDir()
    writeLines(dir, "in.txt", Seq("a b", "c"))
    val trace = dir.resolve("spans.jsonl")
    val rc = Main.run(spark, Main.Args("wordcount",
      dir.resolve("in.txt").toString, dir.resolve("out").toString,
      trace = Some(trace.toString)))
    assert(rc == 0)
    val lines = Files.readAllLines(trace).asScala
    assert(lines.exists(_.contains("\"graft.job.submit\"")))
    assert(lines.exists(_.contains("\"spark.task\"")))
  }

  test("CLI --trace *.zipkin.json flushes the batching exporter at job end") {
    // Regression guard for the bounded-batch exporter: a short job
    // emits fewer spans than one batch, so without the end-of-job
    // flush the file would be empty.
    val dir = tmpDir()
    writeLines(dir, "in.txt", Seq("a b", "c"))
    val trace = dir.resolve("spans.zipkin.json")
    val rc = Main.run(spark, Main.Args("wordcount",
      dir.resolve("in.txt").toString, dir.resolve("out").toString,
      trace = Some(trace.toString)))
    assert(rc == 0)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(trace.toFile)
    assert(root.isArray && root.size() > 0, "zipkin document empty or invalid")
    import scala.jdk.CollectionConverters._
    val names = root.elements().asScala.map(_.get("name").asText()).toSet
    assert(names.contains("graft.job.submit"))
  }

  test("CLI integration: chaos confs + trace sink work together end-to-end") {
    import graft.chaos.SlowInject
    SlowInject.reset(spark)
    spark.conf.set("spark.graft.slow.map.sleep.ms", "1")
    try {
      val dir = tmpDir()
      writeLines(dir, "in.txt", indexFixture)
      val trace = dir.resolve("spans.jsonl")
      val rc = Main.run(spark, Main.Args("insertindex",
        dir.resolve("in.txt").toString, dir.resolve("out").toString,
        trace = Some(trace.toString)))
      assert(rc == 0)
      // Results unchanged under chaos.
      assert(readOut(dir.resolve("out")).head == "apple\tdoc1,doc2,doc3,doc4,doc5")
      // Spans written, including task spans with metrics.
      val spans = java.nio.file.Files.readAllLines(trace)
      assert(spans.toString.contains("graft.job.submit"))
      assert(spans.toString.contains("spark.task"))
    } finally SlowInject.reset(spark)
  }

  test("observe counters: wordcount RAW_LINES / KEYS_DISTINCT / WORDS_EMITTED") {
    val s = spark
    import s.implicits._
    val (df, inObs, outObs) = WordCount.counted(
      Seq("the quick fox", "the dog!").toDF("value"))
    df.collect()
    assert(inObs.get("RAW_LINES") == 2L)
    assert(outObs.get("KEYS_DISTINCT") == 4L) // the, quick, fox, dog
    assert(outObs.get("WORDS_EMITTED") == 5L) // "the" appears twice
  }

  test("observe counters: index RAW_PAIRS_IN / MALFORMED_LINES / UNIQUE_DOCIDS_OUT") {
    val s = spark
    import s.implicits._
    val noisy = indexFixture ++ Seq("", "   ", "notab")
    val (pairs, parseObs) = InvertedIndex.parsePairsCounted(noisy.toDF("value"))
    val (index, reduceObs) = InvertedIndex.postingsCounted(
      pairs, col("word"), col("doc_id"))
    index.collect()
    // Reference semantics (TraceInsertIndexMapper.java:112): RAW_PAIRS_IN
    // counts only well-formed pairs; malformed lines count separately.
    assert(parseObs.get("LINES_IN") == noisy.size.toLong)
    assert(parseObs.get("RAW_PAIRS_IN") == (noisy.size - 3).toLong)
    assert(parseObs.get("MALFORMED_LINES") == 3L)
    assert(reduceObs.get("KEYS_DISTINCT") == 4L)
    assert(reduceObs.get("REDUCER_LIST_EMIT") == 4L)
    assert(reduceObs.get("UNIQUE_DOCIDS_OUT") == 16L)
  }

  test("TextIO.writeTsv renders nulls as empty strings") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    val df = Seq(("a", Some(1)), ("b", None)).toDF("k", "v")
    TextIO.writeTsv(df, dir.resolve("out").toString)
    assert(readOut(dir.resolve("out")).sorted == Seq("a\t1", "b\t"))
  }
}
