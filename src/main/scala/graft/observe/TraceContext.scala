package graft.observe

import java.util.concurrent.ThreadLocalRandom

import org.apache.spark.sql.SparkSession

/** W3C trace-context (`traceparent`) creation, parsing and propagation.
  *
  * Reference parity: the reference injects a `traceparent` into the
  * Hadoop `Configuration` and a UGI token on the client
  * (`/root/reference/trace-wordcount-job/src/main/java/org/example/
  * TraceWordCountJob.java:70-90`) and re-extracts it inside every task
  * (`TraceWordCountMapper.java:41-53,85-86`,
  * `trace-insertindex-job/.../TraceContextUtils.java:42-96`).
  *
  * Spark needs only ONE carrier: job-group local properties set on the
  * driver are shipped to every task and readable via
  * `TaskContext.get().getLocalProperty` — no UGI hop exists (SURVEY
  * §2.11 T2: n/a on Spark).
  */
final case class TraceContext(traceId: String, spanId: String, sampled: Boolean = true) {
  def traceparent: String = s"00-$traceId-$spanId-${if (sampled) "01" else "00"}"
  def child(): TraceContext = copy(spanId = TraceContext.randomHex(16))
}

object TraceContext {

  /** Local-property key carrying the traceparent to executors (≙ the
    * reference's `otel.trace.context.traceparent` conf key). */
  val PropertyKey = "graft.trace.traceparent"

  private[observe] def randomHex(n: Int): String = {
    val sb = new StringBuilder(n)
    val r = ThreadLocalRandom.current()
    (0 until n).foreach(_ => sb.append("0123456789abcdef".charAt(r.nextInt(16))))
    sb.toString
  }

  def create(): TraceContext = TraceContext(randomHex(32), randomHex(16))

  private val Pattern = "00-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})".r

  def parse(traceparent: String): Option[TraceContext] = traceparent match {
    case Pattern(t, s, f) => Some(TraceContext(t, s, f == "01"))
    case _                => None
  }

  /** Inject into the session so every task launched afterwards carries
    * the context (T1 analog). */
  def inject(spark: SparkSession, ctx: TraceContext): Unit =
    spark.sparkContext.setLocalProperty(PropertyKey, ctx.traceparent)

  /** Extract on an executor (T3 analog); call from task-side code such
    * as the chaos wrapper. */
  def fromTask(): Option[TraceContext] =
    Option(org.apache.spark.TaskContext.get())
      .flatMap(tc => Option(tc.getLocalProperty(PropertyKey)))
      .flatMap(parse)
}
