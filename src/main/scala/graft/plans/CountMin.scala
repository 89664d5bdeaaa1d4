package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min frequency sketch — the third classic sketch next to
  * theta (distinct) and KMV (quantiles). d hash rows × w counters;
  * est(x) = min over rows of counter[h_i(x) mod w], an upper bound on
  * the true count with error ≤ N·e/w at confidence 1−e^−d.
  *
  * Counters are SUMS of per-row contributions, so the sketch is a pure
  * function of the input multiset — order- and partition-independent,
  * mergeable by element-wise addition (map-side combine works), and
  * exactly replayable in the DuckDB oracle (same md5-derived row
  * hashes). Memory is d·w longs per group regardless of cardinality.
  */
object CountMinUtil {
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Row-i bucket of a term: first 60 bits of md5("cm<i>:<term>") mod w
    * — mirrors Hashing.h64Seeded / the oracle formulation. */
  def bucket(i: Int, term: String, w: Int): Int = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(s"cm$i:$term".getBytes(UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    ((h >>> 4) % w).toInt
  }
}

/** Aggregate: Count-Min counter matrix (row-major array<long> of
  * length d·w) over a string column. */
case class CountMinAgg(child: Expression, w: Int, d: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(w >= 1 && d >= 1)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < d) { buf(i * w + CountMinUtil.bucket(i, term, w)) += 1; i += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinAgg =
    copy(child = cs.head)
}

object CountMinFunctions {
  /** Column API: Count-Min counter matrix of a string column. */
  def countMin(term: Column, w: Int, d: Int): Column =
    column(CountMinAgg(expression(term), w, d)
      .toAggregateExpression(isDistinct = false))
}
