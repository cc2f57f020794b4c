package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

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
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al.) as a
  * Catalyst-native `TypedImperativeAggregate` — the 100 TB answer to
  * exact top-k term counting: the buffer holds at most `capacity`
  * (term, count, err) entries per group regardless of cardinality,
  * partial-aggregates map-side, and merges with the mergeable-summaries
  * rule (absent keys assume the other side's minimum count), so the
  * shuffle ships ≤ capacity entries per (group, partition) where an
  * exact top-k ships the full term domain.
  *
  * Guarantees (preserved under merge): for every retained term,
  * `est ≥ true_count ≥ est − err`, and any term with
  * `true_count > n / capacity` is retained. When `capacity` is at
  * least the group's distinct-term count NO eviction ever happens, so
  * `est` is the exact count and `err = 0` on every engine and any
  * partitioning — the regime the DuckDB oracle mirrors with plain
  * GROUP BY counts (`q_topk_sketch`; same self-check structure as the
  * KMV sketch). Under eviction the estimates are arrival-order
  * dependent (like any SpaceSaving), so only the GUARANTEES are
  * asserted there (SpaceSavingSpec), never exact values.
  *
  * Output: the top `outK` entries as
  * `array<struct<term string, est long, err long>>`, ordered by
  * (est desc, err asc, term asc) — a total order, so the exact regime
  * is deterministic end to end. */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    outK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(capacity >= 1 && outK >= 1 && outK <= capacity,
    s"need 1 <= outK ($outK) <= capacity ($capacity)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a STRING term column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any = {
    val top = buffer.entries.toSeq
      .sortBy { case (t, (c, e)) => (-c, e, t) }
      .take(outK)
      .map { case (t, (c, e)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(t), c, e))
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val items = buffer.entries.toSeq.map { case (t, (c, e)) =>
      (t.getBytes(StandardCharsets.UTF_8), c, e)
    }
    val bb = ByteBuffer.allocate(4 + items.map(_._1.length + 20).sum)
    bb.putInt(items.size)
    items.foreach { case (b, c, e) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new SpaceSavingBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.entries.put(new String(b, StandardCharsets.UTF_8), (bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}

/** Bounded (term → (count, err)) summary. */
final class SpaceSavingBuffer(val capacity: Int) {
  val entries: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  /** One observation of `term`. Eviction picks a deterministic victim
    * under count ties (largest err, then smallest term) so identical
    * buffers evolve identically. */
  def offer(term: String): Unit = entries.get(term) match {
    case Some((c, e)) => entries.update(term, (c + 1, e))
    case None if entries.size < capacity => entries.update(term, (1L, 0L))
    case None =>
      val (victim, (vc, _)) = entries.minBy { case (t, (c, e)) => (c, -e, t) }
      entries.remove(victim)
      entries.update(term, (vc + 1, vc))
  }

  /** Mergeable-summaries rule: an absent key on one side assumes that
    * side's minimum count (its maximum possible unseen count) as both
    * count and error contribution; then truncate back to capacity. */
  def mergeIn(other: SpaceSavingBuffer): Unit = {
    val minSelf = if (entries.size < capacity) 0L
      else entries.valuesIterator.map(_._1).min
    val minOther = if (other.entries.size < other.capacity) 0L
      else other.entries.valuesIterator.map(_._1).min
    val keys = entries.keySet ++ other.entries.keySet
    val merged = keys.toSeq.map { k =>
      val (ca, ea) = entries.getOrElse(k, (minSelf, minSelf))
      val (cb, eb) = other.entries.getOrElse(k, (minOther, minOther))
      k -> (ca + cb, ea + eb)
    }
    entries.clear()
    merged.sortBy { case (t, (c, e)) => (-c, e, t) }.take(capacity)
      .foreach { case (k, v) => entries.put(k, v) }
  }
}

object SpaceSavingAgg {
  /** Column-API entry: `SpaceSavingAgg(termCol, 64, 10).as("hh")`. */
  def apply(c: Column, capacity: Int, outK: Int): Column =
    Bridge.column(
      SpaceSavingAgg(Bridge.expression(c), capacity, outK).toAggregateExpression())
}
