package graft

import org.apache.spark.sql.SparkSession

import graft.chaos.SlowInject
import graft.observe.{JsonFileExporter, Trace, TraceContext, ZipkinFileExporter}
import graft.operators.{GlobalSort, InvertedIndex, WordCount}
import graft.sources.TextIO

/** CLI entry point with the reference's argument shapes
  * (`/root/reference/trace-sort-job/src/main/java/org/example/
  * TraceSortJob.java:44-54`: `<input> <output> [--reducers N]`, exit 1
  * on bad args, job success → exit 0):
  *
  * {{{
  *   graft.Main wordcount   <in> <out> [--reducers N] [--overwrite] [--trace FILE]
  *   graft.Main sort        <in> <out> [--reducers N] [--overwrite] [--trace FILE]
  *   graft.Main insertindex <in> <out>               [--overwrite] [--trace FILE]
  *   graft.Main query <name> <table-dir> <out>       [--overwrite] [--trace FILE]
  *   graft.Main tsvpair <in> <out>                   [--overwrite] [--trace FILE]
  *   graft.Main inflate <table-dir> <out> [--factor N]           [--trace FILE]
  *   graft.Main quality <table-dir> <out>            [--overwrite] [--trace FILE]
  * }}}
  *
  * `query` runs any named engine query from [[SparkEntry.queries]]
  * (the full relational + LLM-pipeline surface) against a table
  * directory and writes the result as parquet — the switch-over path
  * for a reference user driving the engine from a shell.
  *
  * `tsvpair` is the ingest job for the reference's native on-disk
  * format: read a `word \t docId` line directory through the
  * [[graft.sources.TsvPairSource]] DataSourceV2 (malformed lines
  * dropped with mapper-exact semantics) and write it as a columnar
  * parquet table; the pair count is reported like the kernels'
  * counters. `inflate` shell-exposes the [[Inflate]] scaling harness
  * (deterministic `--factor N` inflation of a testdata directory, its
  * linearity invariants pinned by InflateSpec).
  *
  * `sql` runs ad-hoc SQL text to parquet with the same provenance
  * manifest as `query`; the session carries the `graft` lake catalog
  * and the native function family, so
  * `graft.Main sql "SELECT … FROM graft.\`sf0.01\`.documents" out`
  * works from a shell with pushdown/pruning intact.
  *
  * `quality` runs the data-quality band (q_data_checks +
  * q_column_profile) against a table directory, writes both reports as
  * parquet under `<out>/checks` and `<out>/profile`, and prints the
  * failed check names counters-style — the pre-delivery validation
  * entry point. The exit code reports JOB success; the validation
  * verdict is the checks table itself (a failing check is a result,
  * not a crash).
  *
  * `--reducers N` for sort reproduces the reference's two modes: N == 1
  * (its default) → total order; N > 1 → hash-partitioned sorted runs.
  * Our total order comes from a range shuffle at ANY parallelism, so
  * unlike the reference it needs no single reducer. `--trace FILE`
  * wires the full observability layer (job/task/query spans +
  * traceparent propagation) to a JSON-lines sink — or, when FILE ends
  * in `.zipkin.json`, to a Zipkin-v2 array document (the reference's
  * sink format, ready to POST to `/api/v2/spans`). Chaos injection is
  * honored from `spark.graft.slow.*` confs exactly like the reference's
  * `-D insertindex.slow.*` flags.
  */
object Main {

  final case class Args(kernel: String, in: String, out: String,
                        reducers: Int = 1, overwrite: Boolean = false,
                        trace: Option[String] = None,
                        query: Option[String] = None,
                        factor: Int = 10)

  def parse(argv: Array[String]): Either[String, Args] = {
    if (argv.length < 3)
      return Left("usage: graft.Main <wordcount|sort|insertindex|tsvpair> <in> <out> " +
        "| query <name> <table-dir> <out> " +
        "| sql \"<SELECT ...>\" <out> " +
        "| inflate <table-dir> <out> [--factor N] " +
        "| quality <table-dir> <out> " +
        "[--reducers N] [--overwrite] [--trace FILE]")
    var a = Args(argv(0), argv(1), argv(2))
    var i = 3
    if (a.kernel == "query") {
      if (argv.length < 4) return Left("usage: graft.Main query <name> <table-dir> <out>")
      val name = argv(1)
      if (!SparkEntry.queries.contains(name))
        return Left(s"unknown query: $name (available: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ") + ")")
      a = Args("query", argv(2), argv(3), query = Some(name))
      i = 4
    } else if (!Set("wordcount", "sort", "insertindex", "tsvpair", "inflate",
        "quality", "sql").contains(a.kernel))
      return Left(s"unknown kernel: ${a.kernel}")
    while (i < argv.length) {
      argv(i) match {
        case "--reducers" if i + 1 < argv.length =>
          val n = argv(i + 1).toIntOption.getOrElse(-1)
          if (n < 1) return Left(s"--reducers must be a positive int")
          a = a.copy(reducers = n); i += 2
        case "--overwrite" => a = a.copy(overwrite = true); i += 1
        case "--trace" if i + 1 < argv.length =>
          a = a.copy(trace = Some(argv(i + 1))); i += 2
        case "--factor" if i + 1 < argv.length =>
          val n = argv(i + 1).toIntOption.getOrElse(-1)
          if (n < 1) return Left(s"--factor must be a positive int")
          if (a.kernel != "inflate") return Left("--factor only applies to inflate")
          a = a.copy(factor = n); i += 2
        case other => return Left(s"unknown argument: $other")
      }
    }
    Right(a)
  }

  /** Parquet write with the observed row count and the provenance
    * manifest (`_graft_manifest.json`: query/SQL label, input, rows,
    * sigv1 plan signature) — shared by `query` and `sql`. */
  private def writeWithManifest(df: org.apache.spark.sql.DataFrame,
      label: String, in: String, out: String, overwrite: Boolean): Unit = {
    val obs = new org.apache.spark.sql.Observation()
    val sig = graft.observe.PlanSignature.sigv1(df)
    df.observe(obs, org.apache.spark.sql.functions
      .count(org.apache.spark.sql.functions.lit(1)).as("ROWS_OUT"))
      .write
      .mode(if (overwrite) "overwrite" else "errorifexists")
      .parquet(out)
    val rows = obs.get("ROWS_OUT")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "_graft_manifest.json"),
      s"""{"query": ${JsonUtil.quote(label)}, """ +
        s""""input": ${JsonUtil.quote(in)}, """ +
        s""""rows": $rows, "plan_sig": "$sig"}""")
    System.err.println(s"[graft] counters rows=$rows sig=$sig")
  }

  /** Run a kernel file-to-file; returns the process exit code. */
  def run(spark: SparkSession, a: Args): Int = {
    val exporter = a.trace.map {
      case p if p.endsWith(".zipkin.json") => new ZipkinFileExporter(p)
      case p                               => new JsonFileExporter(p)
    }
    val handle = exporter.map(Trace.install(spark, _))
    val ctx = handle.map(_.ctx).getOrElse(TraceContext.create())

    def body(): Unit = {
      lazy val input = SlowInject.slowMap(TextIO.readLines(spark, a.in)).df
      a.kernel match {
        case "wordcount" =>
          val (counts, inObs, outObs) = WordCount.counted(input)
          // --reducers N mirrors the reference's mapreduce.job.reduces
          // for this job too: N hash-partitioned output files (the
          // usage text advertises it; silently ignoring it would make
          // the flag a no-op here while working for sort).
          val out = if (a.reducers > 1)
            counts.repartition(a.reducers,
              org.apache.spark.sql.functions.col("word"))
          else counts
          TextIO.writeTsv(out, a.out, a.overwrite)
          System.err.println(s"[graft] counters in=${inObs.get} out=${outObs.get}")
        case "sort" =>
          val sorted =
            if (a.reducers <= 1) GlobalSort(input, "value")
            else GlobalSort.sortedRuns(input, a.reducers, "value")
          TextIO.writeTsv(sorted, a.out, a.overwrite)
        case "insertindex" =>
          val (pairs, parseObs) = InvertedIndex.parsePairsCounted(input)
          val (index, reduceObs) = InvertedIndex.postingsCounted(
            pairs, org.apache.spark.sql.functions.col("word"),
            org.apache.spark.sql.functions.col("doc_id"))
          TextIO.writeTsv(index, a.out, a.overwrite)
          System.err.println(
            s"[graft] counters parse=${parseObs.get} reduce=${reduceObs.get}")
        case "query" =>
          // a.in is the table directory; release staged intermediates
          // like Bench/Verify do. The row count rides the write via
          // observe (no second action), and a reproducibility manifest
          // lands next to the parquet: the sigv1 plan signature + the
          // input dir let a consumer verify THIS output came from THIS
          // logical plan over THAT data — the provenance record a
          // 100 TB delivery ships with.
          try {
            writeWithManifest(SparkEntry.queries(a.query.get)(spark, a.in),
              a.query.get, a.in, a.out, a.overwrite)
          } finally graft.queries.StagedCache.releaseAll()
        case "sql" =>
          // a.in is the SQL text. The session has the graft catalog
          // (SPARK_GRAFT_CATALOG_ROOT) and the native SQL functions
          // registered, so `SELECT … FROM graft.`sf0.01`.documents`
          // works from a shell; the catalog itself refuses DDL.
          try {
            writeWithManifest(spark.sql(a.in), "sql", a.in, a.out, a.overwrite)
          } finally graft.queries.StagedCache.releaseAll()
        case "tsvpair" =>
          // Ingest the reference's native format into a columnar table:
          // one pass through the DataSourceV2 (malformed lines dropped,
          // counted as a scan metric), observed pair count reported
          // like the kernels' counters.
          val obs = new org.apache.spark.sql.Observation()
          spark.read.format("tsvpair").load(a.in)
            .observe(obs, org.apache.spark.sql.functions
              .count(org.apache.spark.sql.functions.lit(1)).as("PAIRS_OUT"))
            .write.mode(if (a.overwrite) "overwrite" else "errorifexists")
            .parquet(a.out)
          System.err.println(s"[graft] counters pairs=${obs.get("PAIRS_OUT")}")
        case "inflate" =>
          Inflate.run(spark, a.in, a.out, a.factor)
        case "quality" =>
          val mode = if (a.overwrite) "overwrite" else "errorifexists"
          // Persisted: the write AND the failed-name collect read the
          // checks result; uncached, the collect would re-run every
          // table scan and the RI anti-join a second time.
          val checksDf = SparkEntry.queries("q_data_checks")(spark, a.in)
            .persist()
          try {
            checksDf.write.mode(mode).parquet(s"${a.out}/checks")
            SparkEntry.queries("q_column_profile")(spark, a.in)
              .write.mode(mode).parquet(s"${a.out}/profile")
            // The checks table is tiny (one row per check) by design.
            val failed = checksDf
              .filter(!org.apache.spark.sql.functions.col("passed"))
              .collect().map(_.getString(0)).sorted
            System.err.println(s"[graft] counters checks_failed=${failed.length}" +
              (if (failed.nonEmpty) s" (${failed.mkString(",")})" else ""))
          } finally {
            checksDf.unpersist()
            graft.queries.StagedCache.releaseAll()
          }
      }
    }

    try {
      exporter match {
        case Some(e) => Trace.rootSpan(spark, e, "graft.job.submit", ctx)(body())
        case None    => body()
      }
      0
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] job failed: ${e.getMessage}")
        1
    // uninstall flushes the exporter: the batching Zipkin sink holds up
    // to one batch in memory, and a short job would otherwise exit with
    // its spans unwritten.
    } finally handle.foreach(Trace.uninstall(spark, _))
  }

  def main(argv: Array[String]): Unit = parse(argv) match {
    case Left(msg) =>
      System.err.println(msg)
      sys.exit(1)
    case Right(a) =>
      val spark = GraftSession.getOrCreate(s"graft-${a.kernel}")
      val rc = run(spark, a)
      spark.stop()
      sys.exit(rc)
  }
}
