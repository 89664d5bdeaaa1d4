package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared md5→60-bit seeded hashing (parity with Hashing.h64 /
  * MinHashSignature / the DuckDB oracle). */
object MinHashUtil {
  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Fold one shingle array into the per-seed minima buffer. */
  def updateMins(mins: Array[Long], shingles: ArrayData): Unit = {
    val md = localMd.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i).toString
      var s = 0
      while (s < mins.length) {
        md.reset()
        val d = md.digest((s.toString + ":" + sh).getBytes(UTF_8))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = h >>> 4
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
  }
}

/** Mergeable MinHash sketch as a first-class aggregate function:
  * `groupBy(key).agg(minhash_agg(shingles))` yields one signature per
  * group in a single aggregation — partial buffers combine with
  * element-wise min, so map-side combine works and re-aggregating
  * signatures of terabyte corpora never revisits documents. This is the
  * sketch tier of the engine (the same shape an HLL/theta sketch
  * aggregate would take). */
case class MinHashAgg(child: Expression, numSeeds: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numSeeds)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashUtil.updateMins(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAgg =
    copy(child = cs.head)
}

object MinHashAggFunctions {
  /** Column API: aggregate a shingle-array column into one MinHash
    * signature per group. */
  def minhashAgg(shingles: Column, numSeeds: Int): Column =
    column(MinHashAgg(expression(shingles), numSeeds)
      .toAggregateExpression(isDistinct = false))
}
