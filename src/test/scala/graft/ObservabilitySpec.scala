package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.observe._
import graft.operators.WordCount

/** Observability layer tests (SURVEY §7.1 M2): signature stability,
  * trace propagation, and span/metric emission for a real query. */
class ObservabilitySpec extends AnyFunSuite with SparkSpec {

  private def lines(ls: Seq[String]) = {
    val s = spark
    import s.implicits._
    ls.toDF("value")
  }

  private val fixture = Seq("the quick brown fox", "the lazy dog")

  test("sigv1 is stable across identical pipelines and runs") {
    val a = PlanSignature.sigv1(WordCount(lines(fixture)))
    val b = PlanSignature.sigv1(WordCount(lines(fixture)))
    assert(a == b)
    assert(a.matches("[0-9a-f]{64}"))
  }

  test("sigv1 ignores literal values and data location but sees structure") {
    // Same pipeline, different data → same shape (≙ reference signature
    // excluding input paths).
    val a = PlanSignature.sigv1(WordCount(lines(fixture)))
    val b = PlanSignature.sigv1(WordCount(lines(Seq("entirely different words here"))))
    assert(a == b)
    // Different pipeline → different signature.
    val c = PlanSignature.sigv1(WordCount(lines(fixture)).limit(5))
    assert(a != c)
  }

  test("traceparent round-trips W3C format and propagates to tasks") {
    val ctx = TraceContext.create()
    assert(ctx.traceparent.matches("00-[0-9a-f]{32}-[0-9a-f]{16}-01"))
    assert(TraceContext.parse(ctx.traceparent).contains(ctx))
    assert(TraceContext.parse("garbage").isEmpty)

    TraceContext.inject(spark, ctx)
    val s = spark
    import s.implicits._
    // Executor-side extraction (T3 analog): read the local property
    // inside a task.
    val seen = spark.range(0, 4, 1, 2).mapPartitions { _ =>
      Iterator(TraceContext.fromTask().map(_.traceId).getOrElse("missing"))
    }.collect().toSet
    assert(seen == Set(ctx.traceId))
    spark.sparkContext.setLocalProperty(TraceContext.PropertyKey, null)
  }

  test("TraceListener emits job/task/query spans with TaskMetrics for q_wordcount") {
    val exporter = new InMemoryExporter
    val h = Trace.install(spark, exporter)
    try {
      Trace.rootSpan(spark, exporter, "graft.job.submit", h.ctx) {
        WordCount(lines(fixture)).collect()
      }
      // Listener bus is async: poll up to 10 s.
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
             (exporter.named("spark.task").isEmpty ||
              exporter.named("spark.job").isEmpty ||
              exporter.named("graft.query").isEmpty)) Thread.sleep(100)

      val root = exporter.named("graft.job.submit")
      assert(root.size == 1 && root.head.ok && root.head.kind == "CLIENT")

      val jobs = exporter.named("spark.job")
      assert(jobs.nonEmpty && jobs.forall(_.ok))
      assert(jobs.forall(_.traceId == h.ctx.traceId))

      val tasks = exporter.named("spark.task")
      assert(tasks.nonEmpty)
      assert(tasks.forall(s => s.attributes.contains("records.read")))
      // Something actually flowed: a local-relation scan reports no
      // inputMetrics, but the groupBy's exchange must show shuffle
      // records on both sides.
      assert(tasks.map(_.attributes("shuffle.write.records").toLong).sum > 0)
      assert(tasks.map(_.attributes("shuffle.read.records").toLong).sum > 0)
      assert(tasks.forall(s => s.attributes("spark.task.host").nonEmpty))

      val queries = exporter.named("graft.query")
      assert(queries.nonEmpty)
      val sig = queries.last.attributes("graft.signature")
      assert(sig == PlanSignature.sigv1(WordCount(lines(fixture))))
    } finally Trace.uninstall(spark, h)
  }

  test("ZipkinFileExporter writes a parseable Zipkin v2 payload for a traced job") {
    val path = java.nio.file.Files.createTempDirectory("zipkin")
      .resolve("spans.json").toString
    val exporter = new ZipkinFileExporter(path, "graft-test")
    val h = Trace.install(spark, exporter)
    try {
      Trace.rootSpan(spark, exporter, "graft.job.submit", h.ctx) {
        WordCount(lines(fixture)).collect()
      }
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
             !(exporter.document.contains("spark.task") &&
               exporter.document.contains("graft.query"))) Thread.sleep(100)
    } finally Trace.uninstall(spark, h)

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    assert(root.isArray && root.size() > 0)
    import scala.jdk.CollectionConverters._
    val spans = root.elements().asScala.toSeq
    val ids = spans.map(_.get("id").asText()).toSet
    spans.foreach { s =>
      assert(s.get("traceId").asText() == h.ctx.traceId)
      assert(s.get("id").asText().matches("[0-9a-f]{16}"))
      assert(s.get("timestamp").asLong() > 0L)
      assert(s.get("duration").asLong() >= 1L)
      assert(s.get("localEndpoint").get("serviceName").asText() == "graft-test")
      // Zipkin admits only these kinds; INTERNAL spans must be unkinded.
      if (s.has("kind"))
        assert(Set("CLIENT", "SERVER", "PRODUCER", "CONSUMER")(s.get("kind").asText()))
      // Every parent link resolves inside the document.
      if (s.has("parentId")) assert(ids(s.get("parentId").asText()))
    }
    val queries = spans.filter(_.get("name").asText() == "graft.query")
    assert(queries.nonEmpty && queries.forall(!_.has("kind")))
    assert(spans.exists(s => !s.has("parentId") &&
      s.get("name").asText() == "graft.job.submit")) // the root
    val tasks = spans.filter(_.get("name").asText() == "spark.task")
    assert(tasks.nonEmpty &&
      tasks.forall(_.get("tags").has("records.read")))
  }

  test("ZipkinFileExporter log-and-drops a failed write instead of throwing") {
    val dir = java.nio.file.Files.createTempDirectory("zipkin-io")
    val path = dir.resolve("spans.json")
    val exporter = new ZipkinFileExporter(path.toString, "graft-test", batchSize = 100)
    def span(id: Char) = Span("0123456789abcdef0123456789abcdef",
      id.toString * 16, None, "s", "INTERNAL", 1L, 2L, Map.empty, ok = true)
    exporter.export(span('a'))
    // Sabotage the sink: replace the file with a directory so the
    // RandomAccessFile open fails. The flush must follow the HTTP
    // exporter's policy — log, drop the batch, never propagate.
    java.nio.file.Files.delete(path)
    java.nio.file.Files.createDirectory(path)
    exporter.flush()
    // Restore the sink; later batches export normally and the dropped
    // batch is not resurrected.
    java.nio.file.Files.delete(path)
    exporter.export(span('b'))
    val doc = exporter.document
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(doc)
    assert(root.isArray && root.size() == 1)
    assert(root.get(0).get("id").asText() == "b" * 16)
  }

  test("ZipkinHttpExporter POSTs v2 batches a loopback collector accepts") {
    // The reference's live wire behavior (run.sh:5,82-83): span batches
    // POSTed to /api/v2/spans as application/json. A loopback
    // HttpServer stands in for the Zipkin all-in-one; it must receive
    // payloads that parse as v2 arrays.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v2/spans", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        received.add((ex.getRequestHeaders.getFirst("Content-type"), body))
        ex.sendResponseHeaders(202, -1) // Zipkin answers 202 Accepted
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val exporter = new ZipkinHttpExporter(
        s"http://127.0.0.1:$port/api/v2/spans", "graft-test", batchSize = 2)
      def mk(i: Int) = Span("0123456789abcdef0123456789abcdef", f"$i%016x",
        if (i > 1) Some(f"${1}%016x") else None, s"graft.span$i", "INTERNAL",
        1000L + i, 2000L + i, Map("batch" -> s"$i"), ok = true)
      exporter.export(mk(1))
      exporter.export(mk(2)) // batchSize reached -> auto-flush (POST #1)
      exporter.export(mk(3))
      exporter.flush()       // end-of-job flush (POST #2)
      assert(received.size == 2, s"expected 2 POSTs, got ${received.size}")

      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      import scala.jdk.CollectionConverters._
      val allSpans = received.asScala.toSeq.flatMap { case (ct, body) =>
        assert(ct != null && ct.startsWith("application/json"), s"bad content type $ct")
        val root = mapper.readTree(body)
        assert(root.isArray && root.size() > 0, s"payload not a span array: $body")
        root.elements().asScala.toSeq
      }
      assert(allSpans.size == 3)
      assert(allSpans.map(_.get("name").asText()).toSet ==
        Set("graft.span1", "graft.span2", "graft.span3"))
      allSpans.foreach { s =>
        assert(s.get("traceId").asText() == "0123456789abcdef0123456789abcdef")
        assert(s.get("id").asText().matches("[0-9a-f]{16}"))
        assert(s.get("timestamp").asLong() > 0L && s.get("duration").asLong() >= 1L)
        assert(s.get("localEndpoint").get("serviceName").asText() == "graft-test")
        assert(!s.has("kind")) // INTERNAL spans are unkinded in Zipkin
      }
    } finally server.stop(0)
  }

  test("a traced job's spans arrive at the loopback collector over HTTP") {
    // End-to-end wire parity with the reference (run.sh:5,82-83): run a
    // REAL traced wordcount job with the HTTP exporter installed and
    // assert the collector receives its spans — root span, query spans,
    // task spans with metrics — as parseable v2 batches.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v2/spans", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        received.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        ex.sendResponseHeaders(202, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val exporter = new ZipkinHttpExporter(
        s"http://127.0.0.1:${server.getAddress.getPort}/api/v2/spans",
        "graft-test", batchSize = 4)
      val h = Trace.install(spark, exporter)
      try {
        Trace.rootSpan(spark, exporter, "graft.job.submit", h.ctx) {
          WordCount(lines(fixture)).collect()
        }
        // Listener bus is async: poll, flushing, until the collector
        // has both the root and a task span (or the deadline passes).
        val deadline = System.currentTimeMillis() + 10000
        def seen(s: String) = received.asScalaText.contains(s)
        while (System.currentTimeMillis() < deadline &&
               !(seen("graft.job.submit") && seen("spark.task"))) {
          exporter.flush(); Thread.sleep(100)
        }
      } finally Trace.uninstall(spark, h)

      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      import scala.jdk.CollectionConverters._
      val spans = received.asScala.toSeq.flatMap { body =>
        val root = mapper.readTree(body)
        assert(root.isArray, s"payload not an array: $body")
        root.elements().asScala.toSeq
      }
      val names = spans.map(_.get("name").asText())
      assert(names.contains("graft.job.submit"))
      assert(names.contains("spark.task"))
      assert(spans.forall(_.get("traceId").asText() == h.ctx.traceId))
    } finally server.stop(0)
  }

  private implicit class QueueText(q: java.util.concurrent.ConcurrentLinkedQueue[String]) {
    def asScalaText: String = {
      import scala.jdk.CollectionConverters._
      q.asScala.mkString("\n")
    }
  }

  test("ZipkinHttpExporter survives a dead collector without failing the job") {
    // Telemetry must never fail the job: POST to a closed port logs and
    // drops the batch instead of throwing.
    val port = { // a port with nothing listening
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val exporter = new ZipkinHttpExporter(
      s"http://127.0.0.1:$port/api/v2/spans", "graft-test", batchSize = 1)
    exporter.export(Span("0" * 32, "1" * 16, None, "s", "INTERNAL",
      1L, 2L, Map.empty, ok = true)) // must not throw
    exporter.flush()
  }

  test("streaming queries emit batch-progress spans with input/state metrics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val exporter = new InMemoryExporter
    val h = StreamingTrace.install(spark, exporter)
    val source = MemoryStream[String]
    val q = graft.streaming.StreamingKernels.wordCount(source.toDF())
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode("complete").start()
    try {
      source.addData("the quick fox", "the dog")
      q.processAllAvailable()
      // Listener bus is async.
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
             exporter.named("stream.batch").isEmpty) Thread.sleep(100)
      assert(exporter.named("stream.query.start").nonEmpty)
      val batches = exporter.named("stream.batch")
      assert(batches.nonEmpty)
      assert(batches.map(_.attributes("stream.input.rows").toLong).sum >= 2L,
        s"input rows missing: ${batches.map(_.attributes)}")
      assert(batches.forall(_.attributes.contains("stream.state.rows")))
      assert(batches.forall(_.traceId == h.ctx.traceId))
    } finally {
      q.stop()
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
             exporter.named("stream.query").isEmpty) Thread.sleep(100)
      StreamingTrace.uninstall(spark, h)
    }
    assert(exporter.named("stream.query").nonEmpty) // termination span
  }

  test("span JSON serialization is well-formed") {
    val sp = Span("t" * 32, "s" * 16, Some("p" * 16), "x\"y", "CLIENT",
      1L, 2L, Map("k" -> "v\nw"), ok = true)
    val j = sp.json
    assert(j.contains("\"name\":\"x\\\"y\""))
    assert(j.contains("\"k\":\"v\\nw\""))
    // Parse with the JVM's built-in nashorn-free check: count braces.
    assert(j.startsWith("{") && j.endsWith("}"))
  }
}
