package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom-aggregation surface (SURVEY §2.10): the Spark
  * re-expression of the reference's `Reducer` subclass extension point
  * (`Reducer<KI,VI,KO,VO>.reduce(key, values, ctx)` —
  * `/root/reference/trace-insertindex-job/src/main/java/org/example/
  * TraceInsertIndexReducer.java:57-160`).
  *
  * A Spark `Aggregator[IN, BUF, OUT]` is strictly stronger than an MR
  * reducer: the engine calls `reduce` incrementally per input (so the
  * buffer, not the value iterator, bounds memory) and `merge` across
  * partitions (so it composes with partial aggregation — the combiner
  * the reference never wired up). Prefer built-in Column functions when
  * they exist (codegen'd, Catalyst-optimizable); reach for an
  * Aggregator only for genuinely custom state.
  */
object Aggregators {

  /** The inverted-index reducer as a typed Aggregator: values fold into
    * a dedup set (≙ the reducer's HashSet,
    * `TraceInsertIndexReducer.java:132-135`), output is the sorted
    * comma-joined posting list. Buffer grows with distinct values per
    * key — same memory bound as `collect_set`. */
  object PostingList extends Aggregator[String, Set[String], String] {
    def zero: Set[String] = Set.empty
    def reduce(b: Set[String], v: String): Set[String] = b + v
    def merge(a: Set[String], b: Set[String]): Set[String] = a ++ b
    def finish(b: Set[String]): String = b.toSeq.sorted.mkString(",")
    def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Streaming-friendly numeric summary in one pass (count/sum/min/max
    * + sum of squares for variance) — the shape of a custom metrics
    * reducer; demonstrates a product-typed buffer with a tuple encoder
    * instead of kryo. */
  final case class NumSummary(n: Long, sum: Double, sumSq: Double,
                              min: Double, max: Double) {
    def mean: Double = if (n == 0) 0.0 else sum / n
    // Clamped at 0: the sum-of-squares form can go slightly negative
    // under catastrophic cancellation (large near-equal values), and a
    // negative variance turns downstream sqrt into NaN.
    def variance: Double =
      if (n < 2) 0.0 else math.max(0.0, (sumSq - sum * sum / n) / (n - 1))
  }

  /** Bottom-k values per group with MAP-SIDE partial aggregation: each
    * partition ships at most k values per key into the shuffle, where
    * the window/row_number formulation of top-k shuffles EVERY row and
    * sorts each group. At 100 TB this is the difference between a
    * k-bounded and an unbounded per-key shuffle — the aggregate form is
    * the scale path for group-wise sampling/top-k. Buffer is kept
    * sorted and bounded at k. */
  final case class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0)
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], v: Long): Seq[Long] =
      if (b.size < k) (b :+ v).sorted
      else if (v < b.last) (b.init :+ v).sorted
      else b
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = (a ++ b).sorted.take(k)
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  object Summarize extends Aggregator[Double, NumSummary, NumSummary] {
    def zero: NumSummary =
      NumSummary(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    def reduce(b: NumSummary, v: Double): NumSummary =
      NumSummary(b.n + 1, b.sum + v, b.sumSq + v * v,
        math.min(b.min, v), math.max(b.max, v))
    def merge(a: NumSummary, b: NumSummary): NumSummary =
      if (a.n == 0) b else if (b.n == 0) a
      else NumSummary(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq,
        math.min(a.min, b.min), math.max(a.max, b.max))
    def finish(b: NumSummary): NumSummary = b
    def bufferEncoder: Encoder[NumSummary] = Encoders.product[NumSummary]
    def outputEncoder: Encoder[NumSummary] = Encoders.product[NumSummary]
  }
}
