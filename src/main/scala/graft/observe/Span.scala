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

/** Zipkin-v2 batch exporter: accumulates spans and maintains `path` as a
  * complete Zipkin v2 JSON array — byte-for-byte the payload a real
  * deployment POSTs to `/api/v2/spans` (the reference's endpoint,
  * `run.sh:5`). File-backed because no HTTP client/server belongs in
  * this environment; swapping the file write for an HTTP POST of
  * [[document]] is the only delta to go live. Rewrite-per-export is fine
  * at span volumes (per task, not per record — SURVEY §7.4); a real
  * exporter batches on a timer the same way the OTel agent does. */
final class ZipkinFileExporter(path: String, serviceName: String = "graft")
    extends SpanExporter {
  new File(path).getParentFile match {
    case null => ()
    case d    => d.mkdirs()
  }
  private val buf = mutable.ArrayBuffer.empty[Span]

  /** The complete Zipkin v2 payload for everything exported so far. */
  def document: String = synchronized {
    buf.map(_.zipkinJson(serviceName)).mkString("[", ",", "]")
  }

  def export(span: Span): Unit = synchronized {
    buf += span
    val w = new FileWriter(path, false)
    try w.write(document) finally w.close()
  }
}
