package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch as a Catalyst-native
  * `TypedImperativeAggregate` — the fifth member of the sketch family
  * (KMV cardinality, GK quantiles, SpaceSaving heavy hitters, HLL++
  * cardinality, t-digest): point-frequency ESTIMATES over an unbounded
  * key domain in `depth × width` longs of state per group, with the
  * one-sided guarantee est ≥ exact always, and
  * est ≤ exact + εN (ε = e/width) with probability 1 − e^−depth.
  *
  * Row `r`'s bucket for a value `v` is `hash60("r:" + v) % width` — the
  * SAME seeded family the engine's minhash/sampling use
  * ([[TextFunctions.hash60(seed:Int,c:*]], mirrored by
  * `OracleSql.hash60Seeded`). That choice makes the WHOLE SKETCH
  * deterministic and engine-mirrorable: cell (r, i) is just the count
  * of input rows whose seeded hash lands on i, so DuckDB can recompute
  * every estimate with a plain bucket-count join and the oracle pins
  * the estimate VALUES bit-for-bit, not merely a tolerance gate (a
  * stronger check than HLL++'s, whose register state is
  * engine-internal).
  *
  * Merge is cell-wise long addition — associative and commutative, so
  * partial aggregation (map-side combine) and any shuffle order give
  * identical sketches. The output is the raw `array<array<long>>`
  * counter matrix; readers take `least(cells...)` across rows
  * (see `q_count_min`), which keeps the read path in codegen'd
  * built-ins instead of a custom eval.
  *
  * 100 TB shape: one scan, `depth·width·8` bytes per (group, partition)
  * through the shuffle — constant per group, like the other sketches.
  * The reference has no sketch surface (SURVEY §2.10 tier (b)).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 8, s"count_min depth must be in [1,8], got $depth")
  require(width >= 8, s"count_min width must be >= 8, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min requires a STRING column, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  // "r:" prefixes cached once per operator instance (not per row).
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(r => s"$r:".getBytes("UTF-8"))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < depth) {
        val pre = prefixes(r)
        val seeded = new Array[Byte](pre.length + bytes.length)
        System.arraycopy(pre, 0, seeded, 0, pre.length)
        System.arraycopy(bytes, 0, seeded, pre.length, bytes.length)
        val h = Hash60Impl.hash60(UTF8String.fromBytes(seeded))
        buffer(r * width + (h % width).toInt) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(Array.tabulate(depth) { r =>
      new GenericArrayData(java.util.Arrays.copyOfRange(
        buffer, r * width, (r + 1) * width)): Any
    })

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  /** Column-API entry: `CountMinAgg(col("word"), 3, 256).as("cms")`. */
  def apply(c: Column, depth: Int, width: Int): Column =
    Bridge.column(
      CountMinAgg(Bridge.expression(c), depth, width).toAggregateExpression())
}
