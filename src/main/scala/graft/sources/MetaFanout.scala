package graft.sources

import scala.reflect.ClassTag

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Adaptive serial-vs-distributed fan-out for driver-side filesystem
  * METADATA loops — the general form of the bloom probe's
  * sample-then-decide crossover ([[TxnBloom]]), extracted so every
  * verb with an O(files) metadata loop (FSCK's existence probe, COPY
  * INTO's source listing) shares ONE measured policy instead of
  * re-growing the serial-driver scale-killer the r13 bloom probe had:
  * a handful of ops run serially on the driver (cheap on every
  * store), the remainder is projected from the measured ms/op, and
  * past a fixed budget OR the projected-wall crossover the rest fans
  * out as ONE Spark job. On a local FS an op is ~0.1 ms and the
  * serial path always wins; on an object store at 10–50 ms per
  * metadata round-trip, 100k files would cost the driver ~an hour —
  * the distributed path turns that into one short, wide job. */
private[graft] object MetaFanout {

  /** Hadoop `Configuration` is not `java.io.Serializable`; this is
    * the standard Writable-over-ObjectStream wrapper (the same
    * pattern Spark uses internally) so distributed tasks can rebuild
    * a correctly-credentialed FileSystem on executors. */
  final class SerConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** TEST-ONLY injected latency per metadata op (ms) — MetaFanoutBench
    * models object-store round-trips (10–50 ms per GET/LIST) on a
    * local filesystem, measuring where the distributed path crosses
    * over the serial one. A static volatile (not a conf) so local-mode
    * executor tasks see it too; always 0 outside the bench. */
  @volatile private[graft] var testOpDelayMs: Long = 0L
  private[graft] def simulatedLatency(): Unit =
    if (testOpDelayMs > 0L) Thread.sleep(testOpDelayMs)

  /** Run `op` over `items`: serially on the driver when a measured
    * sample projects that as cheap, as ONE Spark job otherwise.
    * The PROJECTION is the decision-maker — `crossoverKey` (default
    * 250 ms) is the projected-serial-wall threshold past which the
    * job-launch overhead pays for itself; on a local FS at ~0.05 ms/op
    * thousands of items rightly stay serial, on an object store at
    * 10–50 ms/op a few hundred rightly fan out. The projection is
    * re-measured every 64 ops DURING the serial leg, so a sample
    * answered from a warm metadata cache only mis-commits the driver
    * to one chunk, not the whole loop. `budgetKey` is the HARD serial
    * cap (default 100k ops) — an absolute backstop on top of the
    * re-projection; ≤0 forces the distributed path. `op` must be pure and
    * idempotent (Spark may retry tasks) and rebuild filesystem
    * handles from the passed Configuration (`FileSystem.get` caches
    * per scheme, so per-item lookups are cheap). Output preserves
    * item order (parallelize+collect returns partitions in order). */
  def adaptiveMap[T: ClassTag, R: ClassTag](spark: SparkSession,
      items: Seq[T], budgetKey: String, crossoverKey: String)
      (op: (Configuration, T) => Iterable[R]): Seq[R] = {
    if (items.isEmpty) return Nil
    val budget = spark.conf.getOption(budgetKey).map(_.toInt).getOrElse(100000)
    val crossoverMs = spark.conf.getOption(crossoverKey).map(_.toDouble)
      .getOrElse(250.0)
    val hconf = spark.sparkContext.hadoopConfiguration
    def serial(xs: Seq[T]): Seq[R] = xs.flatMap(op(hconf, _))
    if (budget <= 0) return distribute(spark, items)(op)
    // Sample-then-decide: run a few serially (cheap on every store),
    // project the remainder from the measured ms/op, and distribute
    // when EITHER the fixed budget or the projected wall says the
    // driver loop would stall.
    val sampleN = math.min(math.min(8, budget), items.size)
    val t0 = System.nanoTime()
    val sampled = serial(items.take(sampleN))
    val sampleMs = (System.nanoTime() - t0) / 1e6
    val rest = items.drop(sampleN).toIndexedSeq
    // The serial leg RE-PROJECTS as it goes (like listSourceFiles): a
    // sample answered from a warm metadata cache must not commit the
    // driver to the whole loop — every chunk re-measures ms/op over
    // everything done so far and bails to the distributed path the
    // moment the projected remaining wall crosses over (round-17
    // advice: the hard cap alone still allowed up to budget × ms/op of
    // serial driver wall when the sample under-measured).
    val out = Seq.newBuilder[R]
    var done = sampleN
    var spentMs = sampleMs
    var i = 0
    var bailed = false
    while (i < rest.size && !bailed) {
      val remaining = rest.size - i
      if (remaining > budget - done ||
          (done > 0 && spentMs / done * remaining > crossoverMs)) {
        out ++= distribute(spark, rest.drop(i))(op)
        bailed = true
      } else {
        val chunk = math.min(64, remaining)
        val t1 = System.nanoTime()
        var j = 0
        while (j < chunk) { out ++= op(hconf, rest(i + j)); j += 1 }
        spentMs += (System.nanoTime() - t1) / 1e6
        done += chunk
        i += chunk
      }
    }
    sampled ++ out.result()
  }

  /** The distributed leg: one Spark job, ≤ 2× defaultParallelism
    * tasks, results collected to the driver (callers pass metadata
    * items — verdicts, paths — never data rows, so the collect is
    * bounded by the item count that was already driver-resident). */
  def distribute[T: ClassTag, R: ClassTag](spark: SparkSession,
      items: Seq[T])(op: (Configuration, T) => Iterable[R]): Seq[R] = {
    if (items.isEmpty) return Nil
    val sc = spark.sparkContext
    val confB = sc.broadcast(new SerConf(sc.hadoopConfiguration))
    val tasks = math.min(items.size, math.max(1, sc.defaultParallelism * 2))
    sc.parallelize(items, tasks)
      .flatMap(x => op(confB.value.value, x))
      .collect().toSeq
  }
}
