package graft.observe

import java.io.{File, FileWriter}

import scala.collection.mutable

/** Minimal span model carrying the reference's span information content
  * (`TraceWordCountMapper.java:93-157`: name, kind, trace/span/parent
  * ids, start/end, status, string/long attributes). No OTel SDK ships in
  * this environment, so spans are first-class records with pluggable
  * exporters; an OTel/Zipkin exporter is a drop-in implementation of
  * [[SpanExporter]] (≙ the reference's javaagent wiring, `run.sh:43-53`).
  */
final case class Span(
    traceId: String,
    spanId: String,
    parentSpanId: Option[String],
    name: String,
    kind: String, // CLIENT (driver job), INTERNAL (query/stage), CONSUMER (task)
    startMillis: Long,
    endMillis: Long,
    attributes: Map[String, String],
    ok: Boolean,
    error: Option[String] = None) {

  def json: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val attrs = attributes.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    s"""{"traceId":"$traceId","spanId":"$spanId","parentSpanId":"${parentSpanId.getOrElse("")}",""" +
      s""""name":"${esc(name)}","kind":"$kind","startMillis":$startMillis,"endMillis":$endMillis,""" +
      s""""ok":$ok,"error":"${esc(error.getOrElse(""))}","attributes":$attrs}"""
  }

  /** Zipkin v2 JSON span object — the wire format of the reference's
    * actual sink (its OTel agent exports to `POST /api/v2/spans`,
    * `trace-wordcount-job/run.sh:5,43-53`). Mapping follows the public
    * OTel-Zipkin exporter rules: timestamps/durations in MICROseconds;
    * `INTERNAL` spans carry no `kind` (Zipkin kinds are only
    * CLIENT/SERVER/PRODUCER/CONSUMER); failure surfaces as an `error`
    * tag; attributes become string tags. A [[ZipkinFileExporter]]
    * document is a valid ready-to-POST payload. */
  def zipkinJson(serviceName: String): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val kindField = kind match {
      case "CLIENT" | "SERVER" | "PRODUCER" | "CONSUMER" => s""""kind":"$kind","""
      case _ => "" // INTERNAL and unknown kinds are unkinded in Zipkin
    }
    val parentField = parentSpanId.filter(_.nonEmpty)
      .map(p => s""""parentId":"$p",""").getOrElse("")
    val tags = attributes ++
      error.map(e => "error" -> e).toMap ++
      (if (!ok && error.isEmpty) Map("error" -> "true") else Map.empty)
    val tagsJson = tags.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
    s"""{"traceId":"$traceId","id":"$spanId",$parentField"name":"${esc(name)}",""" +
      kindField +
      s""""timestamp":${startMillis * 1000L},"duration":${math.max(endMillis - startMillis, 1L) * 1000L},""" +
      s""""localEndpoint":{"serviceName":"${esc(serviceName)}"},"tags":$tagsJson}"""
  }
}

trait SpanExporter {
  def export(span: Span): Unit

  /** Deliver anything buffered. Batching exporters override; immediate
    * exporters are already durable, so the default is a no-op. Called
    * by `Trace.uninstall` so an installed exporter never loses its tail
    * batch at job end. */
  def flush(): Unit = ()
}

/** Thread-safe buffer exporter for tests and programmatic inspection. */
final class InMemoryExporter extends SpanExporter {
  private val buf = mutable.ArrayBuffer.empty[Span]
  def export(span: Span): Unit = synchronized { buf += span }
  def spans: Seq[Span] = synchronized { buf.toVector }
  def named(name: String): Seq[Span] = spans.filter(_.name == name)
  def clear(): Unit = synchronized { buf.clear() }
}

/** JSON-lines file exporter — the offline stand-in for a Zipkin HTTP
  * sink; one span object per line. */
final class JsonFileExporter(path: String) extends SpanExporter {
  new File(path).getParentFile match {
    case null => ()
    case d    => d.mkdirs()
  }
  def export(span: Span): Unit = synchronized {
    val w = new FileWriter(path, true)
    try { w.write(span.json); w.write("\n") } finally w.close()
  }
}

/** Zipkin-v2 batch exporter: maintains `path` as a complete Zipkin v2
  * JSON array — byte-for-byte the payload a real deployment POSTs to
  * `/api/v2/spans` (the reference's endpoint, `run.sh:5`; the live POST
  * form is [[ZipkinHttpExporter]]).
  *
  * Batching discipline (this IS the OTel agent's shape): spans buffer
  * in memory and every `batchSize` spans the batch is APPENDED to the
  * file and the buffer cleared — heap is bounded by one batch and
  * total file I/O is O(spans), not O(spans²) (appending inside the
  * array rewrites only the trailing `]`, via RandomAccessFile). Call
  * [[flush]] at job end for a complete document; [[document]] flushes
  * and returns the file contents. */
final class ZipkinFileExporter(path: String, serviceName: String = "graft",
                               batchSize: Int = 64)
    extends SpanExporter {
  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
  new File(path).getParentFile match {
    case null => ()
    case d    => d.mkdirs()
  }
  // Each exporter instance OWNS the file: truncate any previous run's
  // document at construction (append-style flushes would otherwise
  // merge stale spans — or corrupt the array if an earlier process
  // died mid-write and left no trailing ']').
  new FileWriter(path, false).close()
  private val buf = mutable.ArrayBuffer.empty[Span]
  // Set when a write failed mid-batch: the document may be torn, so the
  // next successful flush truncates and rewrites instead of appending.
  private var rewriteNeeded = false

  def export(span: Span): Unit = synchronized {
    buf += span
    if (buf.size >= batchSize) flushLocked()
  }

  override def flush(): Unit = synchronized { flushLocked() }

  /** The complete Zipkin v2 payload exported so far (flushes first). */
  def document: String = synchronized {
    flushLocked()
    val f = new File(path)
    if (!f.exists() || f.length() == 0) "[]"
    else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  private def flushLocked(): Unit = {
    // A torn document must be repaired even when no new spans arrived:
    // the uninstall-time flush is often empty, and returning early
    // would leave the file invalid (missing ']') forever.
    if (buf.isEmpty && !rewriteNeeded) return
    if (buf.isEmpty) {
      try {
        val raf = new java.io.RandomAccessFile(path, "rw")
        try {
          System.err.println(s"[zipkin] $path: truncating possibly-torn " +
            "document after a failed write; previously flushed spans dropped")
          raf.setLength(0)
          raf.write("[]".getBytes("UTF-8"))
        } finally raf.close()
        rewriteNeeded = false
      } catch { case e: java.io.IOException =>
        System.err.println(s"[zipkin] repair $path failed: ${e.getMessage}")
      }
      return
    }
    val batch = buf.map(_.zipkinJson(serviceName)).mkString(",")
    // Write-then-clear under [[ZipkinHttpExporter]]'s log-and-drop
    // policy: an IOException must neither propagate into the caller
    // (telemetry never fails the job it observes) nor — as the
    // clear-first form did — silently lose a batch that was never
    // written. The batch is dropped only AFTER the write attempt, so
    // heap stays bounded by one batch either way. A failed write also
    // marks the document suspect: the append protocol assumes the last
    // byte is ']', which a partial write may have left untrue, so the
    // NEXT flush truncates and starts a fresh array rather than
    // appending onto a possibly-torn payload (spans already in the file
    // are dropped with a log line — this is telemetry, not data).
    try {
      val raf = new java.io.RandomAccessFile(path, "rw")
      try {
        if (rewriteNeeded && raf.length() > 0) {
          System.err.println(s"[zipkin] $path: truncating possibly-torn " +
            "document after a failed write; previously flushed spans dropped")
          raf.setLength(0)
        }
        if (raf.length() == 0) raf.write(s"[$batch]".getBytes("UTF-8"))
        else { // overwrite the trailing ']' with ',batch]'
          raf.seek(raf.length() - 1)
          raf.write(s",$batch]".getBytes("UTF-8"))
        }
      } finally raf.close()
      rewriteNeeded = false
      buf.clear()
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[zipkin] write $path failed: ${e.getMessage} (batch dropped)")
        rewriteNeeded = true
        buf.clear()
    }
  }
}

/** Live Zipkin-v2 HTTP exporter: POSTs span batches to a collector
  * endpoint (`http://…/api/v2/spans`) with `Content-Type:
  * application/json` — the reference's actual sink wiring
  * (`trace-wordcount-job/run.sh:5,82-83`: the OTel agent exporting to a
  * Zipkin all-in-one). Same bounded batching as [[ZipkinFileExporter]];
  * a failed POST logs and drops the batch — telemetry must never fail
  * the job it observes. */
final class ZipkinHttpExporter(endpoint: String, serviceName: String = "graft",
                               batchSize: Int = 64)
    extends SpanExporter {
  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
  private val buf = mutable.ArrayBuffer.empty[Span]

  def export(span: Span): Unit = synchronized {
    buf += span
    if (buf.size >= batchSize) flushLocked()
  }

  override def flush(): Unit = synchronized { flushLocked() }

  private def flushLocked(): Unit = {
    if (buf.isEmpty) return
    val payload = buf.map(_.zipkinJson(serviceName)).mkString("[", ",", "]")
    buf.clear()
    try {
      val conn = new java.net.URL(endpoint).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      val out = conn.getOutputStream
      try out.write(payload.getBytes("UTF-8")) finally out.close()
      val code = conn.getResponseCode // a real Zipkin answers 202
      val in = if (code / 100 == 2) conn.getInputStream else conn.getErrorStream
      if (in != null) try { while (in.read() != -1) () } finally in.close()
      if (code / 100 != 2)
        System.err.println(s"[zipkin] POST $endpoint -> $code (batch dropped)")
      conn.disconnect()
    } catch {
      case e: java.io.IOException =>
        System.err.println(s"[zipkin] POST $endpoint failed: ${e.getMessage} (batch dropped)")
    }
  }
}
