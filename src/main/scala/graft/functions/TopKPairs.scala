package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Fixed-k top-k of (score double, id long) pairs per group as a
  * Catalyst-native `TypedImperativeAggregate` — the 100 TB answer to
  * "top-3 neighbors per probe": a `row_number` window over the scored
  * candidate pairs shuffles and sorts EVERY pair row (the ANN family
  * enumerates ~nprobe·cell_size candidates per probe — tens of millions
  * of rows at 100× sf0.1, and the measured round-10 wall after the
  * argmin fix), while this aggregate partial-aggregates map-side: each
  * scan partition reduces to ≤ k entries per probe before the exchange,
  * so the shuffle carries O(probes·k) however many candidates were
  * scored.
  *
  * Ordering is the EXACT total order of the window form it replaces —
  * (score DESC, id ASC) — so results are bit-identical to
  * `row_number() OVER (ORDER BY score DESC, id)` ≤ k and the DuckDB
  * oracles keep their window formulation unchanged. NULL scores or ids
  * are skipped (the window form ranks NULLs last, below k, for every
  * dense-scored query here).
  *
  * Output: `array<struct<id long, score double>>` in rank order
  * (element i is rank i+1), ≤ k elements.
  */
case class TopKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] with BinaryLike[Expression] {

  require(k >= 1 && k <= 1024, s"need 1 <= k ($k) <= 1024")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (DOUBLE score, BIGINT id), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairsBuffer =
    new TopKPairsBuffer(k)

  override def update(buffer: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKPairsBuffer, other: TopKPairsBuffer): TopKPairsBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKPairsBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buffer.size)(i =>
      new GenericInternalRow(Array[Any](buffer.ids(i), buffer.scores(i)))))

  override def serialize(buffer: TopKPairsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairsBuffer(k)
    var i = 0
    while (i < n) {
      // Deserialized entries arrive already rank-ordered, so offer()
      // appends without shifting.
      buf.offer(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairsAgg =
    copy(left = newLeft, right = newRight)
}

object TopKPairsAgg {
  /** `topk_pairs(score, id, k)` as a Column aggregate. */
  def topk(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairsAgg(Bridge.expression(score),
      Bridge.expression(id), k).toAggregateExpression())
}

/** Best-first (score desc, id asc) bounded insertion buffer. k is tiny
  * (3–16 in every caller), so the O(k) shift per improving offer beats
  * any heap bookkeeping; a non-improving offer is one comparison. */
final class TopKPairsBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def offer(s: Double, id: Long): Unit = {
    if (size == k && !beats(s, id, k - 1)) return
    var i = if (size == k) k - 1 else { size += 1; size - 1 }
    while (i > 0 && beats(s, id, i - 1)) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1)
      i -= 1
    }
    scores(i) = s; ids(i) = id
  }

  def mergeIn(o: TopKPairsBuffer): Unit = {
    var i = 0
    while (i < o.size) { offer(o.scores(i), o.ids(i)); i += 1 }
  }
}
