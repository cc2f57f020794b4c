package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** t-digest quantile sketch (Dunning's merging form with the uniform
  * k0 scale function) as a Catalyst-native `TypedImperativeAggregate` —
  * the third quantile form next to the exact two-phase rank selection
  * (`q_percentiles`) and the built-in GK sketch
  * (`q_percentiles_approx`). Unlike GK, a t-digest is MERGEABLE with no
  * accuracy loss compounding per merge — the property that matters on a
  * 1000-executor cluster where every group's sketch is a tree of
  * partial merges — and it answers ANY quantile after the fact from
  * ~2·δ centroids.
  *
  * Buffer: at most 2·δ+1 (mean, weight) centroids plus an 8·δ-point
  * staging array; a compress pass sorts the staged points into the
  * centroid run and greedily re-clusters left-to-right under the
  * uniform weight cap n/δ. The k0 scale trades the tail-adaptive
  * resolution of k1 for a UNIFORM rank-error bound: every cluster
  * carries ≤ n/δ weight, so any reported quantile's rank error is
  * ≤ n/δ (half a cluster each side) — the crisp bound the rank gate
  * in `q_percentiles_tdigest` checks (eps = 2/δ covers interpolation
  * slack). Groups smaller than δ get singleton clusters, i.e. exact
  * order statistics.
  *
  * Estimates depend on input order (as in every t-digest), so the
  * oracle-facing query emits rank-bound BOOLEANS (the guarantee),
  * never the raw estimate — same discipline as `q_percentiles_approx`.
  *
  * Output struct: `n` (total weight), `n_centroids` (bounded state
  * witness), `qs` (one estimate per requested percentile, null when
  * the group is empty).
  */
/** Buffer lifecycle + wire plumbing shared by all three t-digest
  * aggregates (one definition each of create/merge/serialize/
  * deserialize over [[TDigestWire]] — the KmvAggLike discipline). */
sealed trait TDigestAggLike
  extends TypedImperativeAggregate[TDigestBuffer] with UnaryLike[Expression] {
  def child: Expression
  def compression: Int

  override def nullable: Boolean = false
  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(compression)
  override def merge(buffer: TDigestBuffer, other: TDigestBuffer): TDigestBuffer =
    TDigestWire.mergeInto(buffer, other)
  override def serialize(buffer: TDigestBuffer): Array[Byte] =
    TDigestWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestWire.read(bytes, compression)
}

/** Raw-value input leg: updates add one DOUBLE point per row. */
sealed trait TDigestDoubleInput extends TDigestAggLike {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE column, got ${child.dataType.catalogString}")

  override def update(buffer: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double], 1L)
    buffer
  }
}

/** Quantile-struct output leg: `(n, n_centroids, qs)` per group. */
sealed trait TDigestQuantileOutput extends TDigestAggLike {
  def percentiles: Seq[Double]

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_centroids", IntegerType, nullable = false),
    StructField("qs", ArrayType(DoubleType, containsNull = false), nullable = true)))

  override def eval(buffer: TDigestBuffer): Any = {
    buffer.compress()
    if (buffer.total == 0L) {
      new GenericInternalRow(Array[Any](0L, 0, null))
    } else {
      val qs = percentiles.map(buffer.quantile).toArray
      new GenericInternalRow(Array[Any](
        buffer.total, buffer.nCentroids, new GenericArrayData(qs)))
    }
  }
}

case class TDigestAgg(
    child: Expression,
    compression: Int,
    percentiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TDigestDoubleInput with TDigestQuantileOutput {

  require(compression >= 10, s"tdigest needs compression >= 10, got $compression")
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0.0 && p <= 1.0),
    s"tdigest percentiles must lie in [0, 1], got $percentiles")

  override def prettyName: String = "tdigest"

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
}

/** Mutable t-digest state: a sorted centroid run plus an unsorted
  * staging array, re-clustered by [[compress]] under the uniform
  * weight cap total/δ. */
final class TDigestBuffer(val compression: Int) {
  private val stageCap = 8 * compression
  var means: Array[Double] = Array.emptyDoubleArray // ascending after compress
  var weights: Array[Long] = Array.emptyLongArray
  var nCentroids: Int = 0
  private val stageX = new Array[Double](stageCap)
  private val stageW = new Array[Long](stageCap)
  private var nStage = 0
  var total: Long = 0L

  def add(x: Double, w: Long): Unit = {
    if (nStage == stageCap) compress()
    stageX(nStage) = x; stageW(nStage) = w; nStage += 1
    total += w
  }

  def compress(): Unit = {
    if (nStage == 0) return
    val n = nCentroids + nStage
    val xs = new Array[Double](n)
    val ws = new Array[Long](n)
    System.arraycopy(means, 0, xs, 0, nCentroids)
    System.arraycopy(weights, 0, ws, 0, nCentroids)
    System.arraycopy(stageX, 0, xs, nCentroids, nStage)
    System.arraycopy(stageW, 0, ws, nCentroids, nStage)
    val order = Array.range(0, n).sortBy(i => xs(i))
    // Greedy left-to-right clustering under the uniform cap: each
    // emitted cluster holds ≤ cap weight, and any two consecutive
    // clusters exceed cap together, so the count is < 2·total/cap = 2δ.
    val cap = total.toDouble / compression
    val outM = new Array[Double](math.min(n, 2 * compression + 2))
    val outW = new Array[Long](outM.length)
    var k = 0
    var cm = xs(order(0))
    var cw = ws(order(0))
    var i = 1
    while (i < n) {
      val x = xs(order(i)); val w = ws(order(i))
      if (cw + w <= cap) {
        val nw = cw + w
        cm += (x - cm) * w / nw
        cw = nw
      } else {
        outM(k) = cm; outW(k) = cw; k += 1
        cm = x; cw = w
      }
      i += 1
    }
    outM(k) = cm; outW(k) = cw; k += 1
    means = java.util.Arrays.copyOf(outM, k)
    weights = java.util.Arrays.copyOf(outW, k)
    nCentroids = k
    nStage = 0
  }

  /** Standard t-digest quantile read: centroid i covers the rank
    * interval around its midpoint position cum + w_i/2; linear
    * interpolation between adjacent midpoints, clamped to the extreme
    * centroid means at the tails. Call [[compress]] first. */
  def quantile(p: Double): Double = {
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return means(0)
    val t = p * total
    var cum = 0.0
    var prevPos = Double.NaN
    var prevMean = Double.NaN
    var i = 0
    while (i < nCentroids) {
      val pos = cum + weights(i) / 2.0
      if (t <= pos) {
        return if (i == 0 || pos == prevPos) means(i)
        else prevMean + (means(i) - prevMean) * (t - prevPos) / (pos - prevPos)
      }
      cum += weights(i)
      prevPos = pos
      prevMean = means(i)
      i += 1
    }
    means(nCentroids - 1)
  }
}

object TDigestAgg {
  /** Column-API entry: `TDigestAgg(valueCol, 100, Seq(0.5, 0.9)).as("td")`. */
  def apply(c: Column, compression: Int, percentiles: Seq[Double]): Column =
    Bridge.column(
      TDigestAgg(Bridge.expression(c), compression, percentiles)
        .toAggregateExpression())
}

/** The digest as a STORED value: aggregates raw doubles into the
  * serialized centroid array (binary) instead of reading quantiles out
  * — the sketch-rollup write side. Persist one row per (group, day);
  * [[TDigestMergeAgg]] later answers any quantile over any group-set
  * union without touching raw data again. Same buffer, same wire
  * format as [[TDigestAgg]]'s shuffle serialization. */
case class TDigestSketchAgg(
    child: Expression,
    compression: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TDigestDoubleInput {

  require(compression >= 10, s"tdigest_sketch needs compression >= 10, got $compression")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "tdigest_sketch"

  override def eval(buffer: TDigestBuffer): Any = TDigestWire.write(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestSketchAgg =
    copy(child = newChild)
}

object TDigestSketchAgg {
  def apply(c: Column, compression: Int): Column =
    Bridge.column(
      TDigestSketchAgg(Bridge.expression(c), compression).toAggregateExpression())
}

/** The rollup read side: aggregates STORED digests (binary, from
  * [[TDigestSketchAgg]]) by merging their centroid sets, then answers
  * the requested percentiles — same output struct as [[TDigestAgg]].
  * Merging compounds no error beyond the uniform cap (each merge
  * re-clusters under the combined total's cap), so a year of daily
  * sketches rolls up as soundly as one pass over the raw values. */
case class TDigestMergeAgg(
    child: Expression,
    compression: Int,
    percentiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TDigestQuantileOutput {

  require(compression >= 10, s"tdigest_merge needs compression >= 10, got $compression")
  require(percentiles.nonEmpty && percentiles.forall(p => p >= 0.0 && p <= 1.0),
    s"tdigest_merge percentiles must lie in [0, 1], got $percentiles")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tdigest_merge requires a BINARY digest column, got ${child.dataType.catalogString}")

  override def prettyName: String = "tdigest_merge"

  override def update(buffer: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null)
      TDigestWire.mergeInto(buffer,
        TDigestWire.read(v.asInstanceOf[Array[Byte]], compression))
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestMergeAgg =
    copy(child = newChild)
}

object TDigestMergeAgg {
  def apply(c: Column, compression: Int, percentiles: Seq[Double]): Column =
    Bridge.column(
      TDigestMergeAgg(Bridge.expression(c), compression, percentiles)
        .toAggregateExpression())
}

/** Shared wire form: `[n_centroids, (mean double, weight long)*]` —
  * identical for the shuffle-partial serialization and the STORED
  * binary, so a persisted sketch is bit-compatible with the in-flight
  * one. */
object TDigestWire {
  def write(buffer: TDigestBuffer): Array[Byte] = {
    buffer.compress()
    val bb = ByteBuffer.allocate(4 + buffer.nCentroids * 16)
    bb.putInt(buffer.nCentroids)
    var i = 0
    while (i < buffer.nCentroids) {
      bb.putDouble(buffer.means(i)); bb.putLong(buffer.weights(i)); i += 1
    }
    bb.array()
  }

  def read(bytes: Array[Byte], compression: Int): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TDigestBuffer(compression)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  def mergeInto(buffer: TDigestBuffer, other: TDigestBuffer): TDigestBuffer = {
    other.compress()
    var i = 0
    while (i < other.nCentroids) {
      buffer.add(other.means(i), other.weights(i))
      i += 1
    }
    buffer
  }
}
