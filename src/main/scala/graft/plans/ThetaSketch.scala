package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._

/** Deterministic KMV ("k minimum values") / theta sketches.
  *
  * The classic sketch tier of an analytics engine (HLL/theta/quantile),
  * built so the DuckDB oracle can replay it EXACTLY: the sketch keeps
  * the k smallest **md5-derived** hash values of the distinct keys —
  * a pure function of the input set, independent of arrival order,
  * partitioning, and merge tree — unlike HLL++ whose estimate has no
  * cross-engine oracle (events_approx_users stays rows-only for that
  * reason).
  *
  *  - Distinct estimate: with U(k) = kth-smallest-hash / 2^60, the
  *    standard KMV estimator (k-1)/U(k); exact count below k.
  *  - Quantiles: `KmvSampleAgg` retains the VALUE attached to each of
  *    the k smallest KEY hashes — a uniform sample of the distinct-key
  *    population — and positional quantiles of the sorted sample
  *    estimate the population quantiles. Deterministic sample ⇒
  *    deterministic quantile ⇒ SQL oracle.
  *
  * Both are TypedImperativeAggregates with cheap merges (k-way min of
  * two sorted sets), so partial aggregation combines map-side and
  * sketches of petabyte groups compose without revisiting rows.
  */
object ThetaSketch {

  /** Hash space of the md5-derived h64: 2^60, exactly representable. */
  val HashSpace: Double = 1152921504606846976.0

  /** KMV estimate from a sorted min-k array: exact below k. */
  def estimate(sorted: Array[Long], k: Int): Double =
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble * HashSpace / sorted(k - 1).toDouble
}

/** Min-k distinct hash values of `child` (a pre-hashed int64 column,
  * e.g. Hashing.h64 of the key) — emitted as a sorted array<long>. */
case class ThetaSketchAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new java.util.TreeSet[java.lang.Long]()
    (0 until bytes.length / 8).foreach(_ => buf.add(bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = cs.head)
}

/** (hash, value) pairs with the k smallest DISTINCT hashes — a
  * deterministic uniform sample of the distinct-key population, emitted
  * as array<struct<h:long, v:long>> sorted by hash. Ties on a hash keep
  * the smallest value (deterministic under duplicate keys). */
case class KmvSampleAgg(hash: Expression, value: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(k >= 2)

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
                   StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "kmv_sample"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def insert(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     h: Long, v: Long): Unit = {
    val existing = buf.get(h)
    if (existing != null) {
      if (v < existing) { buf.put(h, v); () }
    } else if (buf.size < k) { buf.put(h, v); () }
    else if (h < buf.lastKey()) { buf.put(h, v); buf.remove(buf.lastKey()); () }
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) insert(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     b2: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); insert(b1, e.getKey, e.getValue) }
    b1
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val rows = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      rows(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    buf.forEach((h, v) => { bb.putLong(h); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    (0 until bytes.length / 16).foreach(_ => buf.put(bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KmvSampleAgg =
    copy(hash = cs(0), value = cs(1))
}

object ThetaSketchFunctions {
  /** Column API: sorted min-k array of a pre-hashed int64 key column. */
  def thetaSketch(hashed: Column, k: Int): Column =
    column(ThetaSketchAgg(expression(hashed), k)
      .toAggregateExpression(isDistinct = false))

  /** Column API: deterministic KMV sample of (hashed key, int64 value). */
  def kmvSample(hashed: Column, value: Column, k: Int): Column =
    column(KmvSampleAgg(expression(hashed), expression(value), k)
      .toAggregateExpression(isDistinct = false))
}
