package graft.observe

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd, JobSucceeded}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Driver-side listeners emitting the reference's span hierarchy from
  * Spark's event bus:
  *
  *  - job spans ≙ the `mr.job.submit` root span
  *    (`TraceWordCountJob.java:62-156`),
  *  - per-task spans with record/byte/spill/shuffle metrics ≙ the
  *    per-map()/reduce() spans (`TraceWordCountMapper.java:129-155`,
  *    `TraceWordCountReducer.java:119-135`) — granularity is per TASK
  *    (SURVEY §7.4: a reference span per record would be millions of
  *    spans at 100 TB; the information — record/byte counts — rides as
  *    attributes instead),
  *  - query spans stamped with the structural signature ≙ sigv1 on every
  *    span (`TraceWordCountJob.java:132-143`).
  *
  * All metrics come from `TaskMetrics`, the Spark analog of the Hadoop
  * counters the reference reads (`FILE_BYTES_READ`, `SPILLED_RECORDS`,
  * `REDUCE_SHUFFLE_BYTES`, …).
  */
final class TraceListener(exporter: SpanExporter, ctx: TraceContext)
    extends SparkListener {

  private val jobStarts = TrieMap.empty[Int, (Long, String)] // jobId → (t0, spanId)
  private val stageToJob = TrieMap.empty[Int, Int]
  // jobId → its stage ids, so onJobEnd can prune stageToJob — without
  // it a long-lived installed listener (streaming micro-batches every
  // few seconds) grows one entry per stage forever.
  private val jobStages = TrieMap.empty[Int, Seq[Int]]

  override def onJobStart(ev: SparkListenerJobStart): Unit = {
    val spanId = TraceContext.randomHex(16)
    jobStarts.put(ev.jobId, (ev.time, spanId))
    jobStages.put(ev.jobId, ev.stageIds)
    ev.stageIds.foreach(stageToJob.put(_, ev.jobId))
  }

  override def onJobEnd(ev: SparkListenerJobEnd): Unit = {
    jobStages.remove(ev.jobId).foreach(_.foreach(stageToJob.remove))
    val (t0, spanId) = jobStarts.remove(ev.jobId).getOrElse((ev.time, TraceContext.randomHex(16)))
    val ok = ev.jobResult == JobSucceeded
    exporter.export(Span(ctx.traceId, spanId, Some(ctx.spanId),
      name = "spark.job", kind = "CLIENT",
      startMillis = t0, endMillis = ev.time,
      attributes = Map("spark.job.id" -> ev.jobId.toString),
      ok = ok, error = if (ok) None else Some(ev.jobResult.toString)))
  }

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val m = ev.taskMetrics
    val parent = jobStarts.get(stageToJob.getOrElse(ev.stageId, -1)).map(_._2)
    val attrs = Map(
      "spark.stage.id" -> ev.stageId.toString,
      "spark.task.partition" -> ev.taskInfo.index.toString,
      "spark.task.attempt" -> ev.taskInfo.attemptNumber.toString,
      // ≙ the reference recording attempt ids for straggler analysis
      // (TraceWordCountMapper.java:70-72): a speculative win shows as a
      // successful attempt > 0 span with this flag set.
      "spark.task.speculative" -> ev.taskInfo.speculative.toString,
      "spark.task.status" -> ev.taskInfo.status,
      "spark.task.host" -> ev.taskInfo.host,
      "task.type" -> ev.taskType) ++ (if (m == null) Map.empty[String, String] else Map(
      // ≙ MAP_INPUT_RECORDS / FILE_BYTES_READ fallback chain
      // (TraceSortMapper.java:134-154)
      "records.read" -> m.inputMetrics.recordsRead.toString,
      "bytes.read" -> m.inputMetrics.bytesRead.toString,
      "records.written" -> m.outputMetrics.recordsWritten.toString,
      "bytes.written" -> m.outputMetrics.bytesWritten.toString,
      // ≙ REDUCE_SHUFFLE_BYTES (TraceWordCountReducer.java:125)
      "shuffle.read.bytes" -> m.shuffleReadMetrics.totalBytesRead.toString,
      "shuffle.read.records" -> m.shuffleReadMetrics.recordsRead.toString,
      "shuffle.write.bytes" -> m.shuffleWriteMetrics.bytesWritten.toString,
      "shuffle.write.records" -> m.shuffleWriteMetrics.recordsWritten.toString,
      // ≙ SPILLED_RECORDS (TraceWordCountMapper.java:144)
      "spill.memory.bytes" -> m.memoryBytesSpilled.toString,
      "spill.disk.bytes" -> m.diskBytesSpilled.toString,
      "executor.run.ms" -> m.executorRunTime.toString,
      "jvm.gc.ms" -> m.jvmGCTime.toString)) ++
      // Engine accumulators (chaos-injection hit counters etc.) ride on
      // the task span — ≙ the reference stamping SLOW_INJECT_* counters
      // alongside its span attributes (TraceInsertIndexMapper.java:131).
      ev.taskInfo.accumulables
        .filter(a => a.name.exists(_.startsWith("graft.")))
        .map(a => a.name.get -> a.update.map(_.toString).getOrElse("0"))
    exporter.export(Span(ctx.traceId, TraceContext.randomHex(16),
      parent.orElse(Some(ctx.spanId)),
      name = "spark.task", kind = "CONSUMER",
      startMillis = ev.taskInfo.launchTime, endMillis = ev.taskInfo.finishTime,
      attributes = attrs,
      ok = ev.taskInfo.successful,
      error = if (ev.taskInfo.successful) None else Some(ev.reason.toString)))
  }
}

/** Per-query spans stamped with the sigv1 structural signature. */
final class QueryTraceListener(exporter: SpanExporter, ctx: TraceContext)
    extends QueryExecutionListener {

  private def emit(funcName: String, qe: QueryExecution, durationNs: Long,
                   err: Option[Exception]): Unit = {
    val end = System.currentTimeMillis()
    exporter.export(Span(ctx.traceId, TraceContext.randomHex(16), Some(ctx.spanId),
      name = "graft.query", kind = "INTERNAL",
      startMillis = end - durationNs / 1000000, endMillis = end,
      attributes = Map(
        "graft.action" -> funcName,
        "graft.signature" -> PlanSignature.sha256Hex(
          PlanSignature.shapeOf(qe.analyzed) + "|" +
            PlanSignature.reducerBucket(qe.sparkSession) + "|sigv1")),
      ok = err.isEmpty, error = err.map(_.toString)))
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    emit(funcName, qe, durationNs, None)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    emit(funcName, qe, 0L, Some(exception))
}

/** Install/teardown helper: one call wires the whole observability layer
  * (trace context injection + job/task/query listeners). */
object Trace {

  final case class Handle(ctx: TraceContext, listener: TraceListener,
                          queryListener: QueryTraceListener,
                          exporter: SpanExporter)

  def install(spark: SparkSession, exporter: SpanExporter,
              parent: Option[TraceContext] = None): Handle = {
    val ctx = parent.getOrElse(TraceContext.create())
    TraceContext.inject(spark, ctx)
    val l = new TraceListener(exporter, ctx)
    val ql = new QueryTraceListener(exporter, ctx)
    spark.sparkContext.addSparkListener(l)
    spark.listenerManager.register(ql)
    Handle(ctx, l, ql, exporter)
  }

  def uninstall(spark: SparkSession, h: Handle): Unit = {
    spark.sparkContext.removeSparkListener(h.listener)
    spark.listenerManager.unregister(h.queryListener)
    // A batching exporter (Zipkin file/HTTP) may hold a tail batch.
    // Listener-bus events are async: anything still in flight at this
    // point lands in the buffer and goes out on the next batch
    // boundary or flush/document call — harnesses that need the very
    // last task span poll the exporter (as ObservabilitySpec does)
    // before uninstalling.
    h.exporter.flush()
  }

  /** Run `body` under a root CLIENT span (≙ `mr.job.submit`,
    * `TraceWordCountJob.java:62-156`): records success/error status and
    * re-throws. */
  def rootSpan[A](spark: SparkSession, exporter: SpanExporter, name: String,
                  ctx: TraceContext)(body: => A): A = {
    val t0 = System.currentTimeMillis()
    try {
      val r = body
      exporter.export(Span(ctx.traceId, ctx.spanId, None, name, "CLIENT",
        t0, System.currentTimeMillis(), Map("graft.root" -> "true"), ok = true))
      r
    } catch {
      case e: Throwable =>
        exporter.export(Span(ctx.traceId, ctx.spanId, None, name, "CLIENT",
          t0, System.currentTimeMillis(), Map("graft.root" -> "true"),
          ok = false, error = Some(e.toString)))
        throw e
    }
  }
}
