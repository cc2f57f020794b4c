package graft.observe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-query observability: one span per completed micro-batch
  * carrying the progress metrics a stream operator dashboard needs
  * (input rows, processed rows/sec, batch duration, state-store rows,
  * watermark) — the Structured-Streaming extension of the batch
  * job/task spans ([[TraceListener]]). Query start/termination emit
  * boundary spans so a stream's lifetime is one trace segment.
  *
  * Built on the PUBLIC `StreamingQueryListener` API; per-batch volume
  * is one span per micro-batch (seconds apart), far below the batch
  * task-span rate, so any [[SpanExporter]] batching policy holds.
  */
final class StreamingTraceListener(exporter: SpanExporter, ctx: TraceContext)
    extends StreamingQueryListener {

  import StreamingQueryListener._

  private val started =
    scala.collection.concurrent.TrieMap.empty[java.util.UUID, Long]

  override def onQueryStarted(ev: QueryStartedEvent): Unit = {
    started.put(ev.id, System.currentTimeMillis())
    exporter.export(Span(ctx.traceId, TraceContext.randomHex(16), Some(ctx.spanId),
      name = "stream.query.start", kind = "CLIENT",
      startMillis = System.currentTimeMillis(),
      endMillis = System.currentTimeMillis(),
      attributes = Map("stream.query.id" -> ev.id.toString,
        "stream.query.name" -> Option(ev.name).getOrElse("")),
      ok = true))
  }

  override def onQueryProgress(ev: QueryProgressEvent): Unit = {
    val p = ev.progress
    val end = System.currentTimeMillis()
    val stateRows = Option(p.stateOperators).toSeq.flatten
      .map(_.numRowsTotal).sum
    exporter.export(Span(ctx.traceId, TraceContext.randomHex(16), Some(ctx.spanId),
      name = "stream.batch", kind = "CLIENT",
      startMillis = end - math.max(p.batchDuration, 1L), endMillis = end,
      attributes = Map(
        "stream.query.id" -> p.id.toString,
        "stream.batch.id" -> p.batchId.toString,
        "stream.input.rows" -> p.numInputRows.toString,
        "stream.processed.rows.per.sec" -> p.processedRowsPerSecond.toString,
        "stream.batch.duration.ms" -> p.batchDuration.toString,
        "stream.state.rows" -> stateRows.toString,
        "stream.watermark" -> Option(p.eventTime)
          .flatMap(m => Option(m.get("watermark"))).getOrElse("")),
      ok = true))
  }

  override def onQueryTerminated(ev: QueryTerminatedEvent): Unit = {
    val t0 = started.remove(ev.id).getOrElse(System.currentTimeMillis())
    val ok = ev.exception.isEmpty
    exporter.export(Span(ctx.traceId, TraceContext.randomHex(16), Some(ctx.spanId),
      name = "stream.query", kind = "CLIENT",
      startMillis = t0, endMillis = System.currentTimeMillis(),
      attributes = Map("stream.query.id" -> ev.id.toString),
      ok = ok, error = ev.exception))
  }
}

object StreamingTrace {

  final case class Handle(ctx: TraceContext, listener: StreamingTraceListener,
                          exporter: SpanExporter)

  def install(spark: SparkSession, exporter: SpanExporter,
              parent: Option[TraceContext] = None): Handle = {
    val ctx = parent.getOrElse(TraceContext.create())
    val l = new StreamingTraceListener(exporter, ctx)
    spark.streams.addListener(l)
    Handle(ctx, l, exporter)
  }

  def uninstall(spark: SparkSession, h: Handle): Unit = {
    spark.streams.removeListener(h.listener)
    h.exporter.flush()
  }
}
