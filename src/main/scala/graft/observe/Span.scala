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
