package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KMV (K-Minimum-Values) distinct-count sketch as a Catalyst-native
  * `TypedImperativeAggregate` — the 100 TB answer to `countDistinct`:
  * the aggregation buffer is a BOUNDED set of the k smallest distinct
  * hash values (k·8 bytes per group, vs. `countDistinct`'s exact
  * hash-set of every distinct value), it partial-aggregates map-side,
  * and two sketches merge by unioning and re-truncating, so the shuffle
  * ships at most k longs per (group, partition).
  *
  * Input is an already-hashed LONG column (use [[Hash60Expr]] — uniform
  * on [0, 2⁶⁰)). Determinism: the result depends only on the SET of
  * input values (duplicates and order are irrelevant by construction),
  * so the sketch is reproducible across engines, shardings, and rounds
  * — the property that lets DuckDB mirror it exactly (the k-th smallest
  * distinct hash is plain SQL: `row_number() OVER (ORDER BY h)`).
  *
  * Output struct:
  *   - `n_filled`: buffer occupancy = min(n_distinct, k)
  *   - `kth_min` : largest retained hash (the k-th minimum once full)
  *   - `est`     : exact n_distinct while the buffer isn't full, else
  *                 the KMV order-statistics estimator
  *                 round((k−1) · 2⁶⁰ / kth_min) — all arithmetic in
  *                 IEEE double, bit-identical in any engine.
  *
  * The reference has no sketch surface; this is the SURVEY §2.10
  * "Catalyst-native reducer" tier beyond typed `Aggregator`s
  * (preference tier (b): custom expression where built-ins can't
  * express the semantics — `approx_count_distinct`'s HLL is
  * engine-internal and not oracle-mirrorable, KMV is).
  */
/** The update/merge/wire plumbing shared by both KMV aggregates —
  * one definition of the buffer lifecycle and byte layout
  * (`[n, h*]`, each h a big-endian long), so the two forms cannot
  * drift (the round-8 dedup the TDigestWire extraction started). */
sealed trait KmvAggLike
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {
  def child: Expression
  def k: Int

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG hash column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) buffer.add(it.next())
    buffer
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.set.size * 8)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggLike {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("n_filled", LongType, nullable = false),
    StructField("kth_min", LongType, nullable = true),
    StructField("est", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def eval(buffer: KmvBuffer): Any = {
    val filled = buffer.set.size.toLong
    if (filled == 0L) {
      new GenericInternalRow(Array[Any](0L, null, 0L))
    } else {
      val kth = buffer.set.last().longValue()
      val est =
        if (filled < k) filled
        // (k-1)·2⁶⁰ is exact in double (7 significant bits); int64→double
        // and the division round identically under IEEE in any engine.
        // kth=0 (probability 2⁻⁶⁰ per group) would divide by zero; the
        // buffer then holds ≥k distinct values of which 0 is smallest —
        // degenerate only if ALL retained are 0, impossible for distinct.
        else Math.round((k - 1).toDouble * 1.152921504606846976e18 / kth.toDouble)
      new GenericInternalRow(Array[Any](filled, kth, est))
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinctAgg =
    copy(child = newChild)
}

/** Bounded sorted set of the k smallest distinct longs. */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (set.size < k) set.add(h)
    else if (h < set.last()) { if (set.add(h)) set.pollLast() }
  }
}

/** The RAW k-minima as a sorted `array<long>` — the mergeable set-sketch
  * form of [[KmvDistinctAgg]] (same bounded buffer, same map-side
  * partials). Exposing the values instead of the estimate is what
  * SET-OPERATION estimators need: two groups' k-min arrays combine
  * into a Jaccard/containment/union estimate with plain array ops
  * (take the k smallest of the union, count how many lie in both) —
  * per-group state stays k longs through every shuffle, and the
  * result depends only on the input SET, so any engine reproduces it
  * (the oracle's mirror is `row_number() OVER (ORDER BY h) <= k`).
  */
case class KmvValuesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KmvAggLike {

  require(k >= 2, s"kmv_values needs k >= 2, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_values"

  override def eval(buffer: KmvBuffer): Any = {
    val out = new Array[Any](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValuesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValuesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvValuesAgg =
    copy(child = newChild)
}

object KmvValuesAgg {
  /** Column-API entry: `KmvValuesAgg(hashCol, 256).as("mins")`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(
      KmvValuesAgg(Bridge.expression(c), k).toAggregateExpression())
}

object KmvDistinctAgg {
  /** Column-API entry: `KmvDistinctAgg(hashCol, 128).as("sk")`. */
  def apply(c: Column, k: Int): Column =
    Bridge.column(
      KmvDistinctAgg(Bridge.expression(c), k).toAggregateExpression())
}
