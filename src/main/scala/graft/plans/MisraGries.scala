package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a first-class aggregate —
  * `df.agg(mg_sketch(term, k))` holds at most `k` counters however many
  * distinct terms stream through, and MERGED sketches keep the classic
  * guarantee (Misra-Gries 1982; mergeability per Agarwal et al. 2013,
  * "Mergeable Summaries"): every item with true count > n/(k+1)
  * SURVIVES in the final sketch. That makes it the pass-1 candidate
  * generator of the two-pass exact heavy-hitters pattern
  * ([[graft.operators.CorpusStats.heavyHitters]]): pass 1 never
  * shuffles more than k counters per partial buffer, pass 2 recounts
  * only the ≤ k candidates exactly.
  *
  * Update: hit → +1; miss with room → insert at 1; miss when full →
  * decrement ALL counters by 1, dropping zeros (the arrival is
  * discarded). Merge: sum counts per key, and if more than k survive,
  * subtract the (k+1)-th largest count from every counter and keep the
  * positives — the merge-side analog of the decrement step.
  *
  * Counts in the sketch are ESTIMATES (true − n/(k+1) ≤ est ≤ true);
  * only the key set is consumed downstream, so the engine never treats
  * them as answers.
  */
case class MisraGriesAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "mg_sketch capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.toString
      buf.get(term) match {
        case Some(c) => buf(term) = c + 1
        case None if buf.size < capacity => buf(term) = 1L
        case None => // full: decrement everything, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1(k) = b1.getOrElse(k, 0L) + c }
    if (b1.size > capacity) {
      // subtract the (k+1)-th largest count from all, keep positives
      val m = b1.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace((_, c) => c - m)
      b1.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic key order (the buffer is a hash map)
    val entries = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(_._2: Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val parts = buf.toArray.map { case (k, c) => (k.getBytes(UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + parts.map(_._1.length + 12).sum)
    bb.putInt(parts.length)
    parts.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf(new String(kb, UTF_8)) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = cs.head)
}

object MisraGries {
  /** Column API: aggregate a string column into one ≤`capacity`-entry
    * frequent-items map per group. */
  def mgSketch(term: Column, capacity: Int): Column =
    column(MisraGriesAgg(expression(term), capacity)
      .toAggregateExpression(isDistinct = false))
}
