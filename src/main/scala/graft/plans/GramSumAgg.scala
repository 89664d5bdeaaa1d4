package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Mergeable second-moment (Gram/covariance) matrix aggregate over a
  * fixed-dimension integer vector column: one pass over the corpus
  * accumulates `n`, the per-dimension sums, and every upper-triangle
  * cross-product sum into a single flat buffer — partial-aggregable
  * (merge = element-wise add), so the full d×d covariance of a
  * terabyte embedding table costs exactly one narrow scan and one
  * O(d²)-byte final merge, never an N·d² row explosion or a shuffle
  * of vector data.
  *
  * Inputs are pre-quantized longs (the dim-stats u3 discipline:
  * round(x·1000)) so the sums are order-independent integers —
  * bit-identical across engines and partitionings.
  *
  * Buffer layout (longs): [n, s_0..s_{d-1}, p_{0,0}, p_{0,1}, ...,
  * p_{d-1,d-1}] with the cross products in upper-triangle row-major
  * order — p_{i,j} (i ≤ j) at offset 1 + d + i·d − i(i−1)/2 + (j−i).
  */
case class GramSumAgg(child: Expression, dim: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val pairBase = 1 + dim

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_sum_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + dim * (dim + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"gram_sum_agg(dim=$dim) fed a length-${arr.numElements()} vector")
      buf(0) += 1L
      var i = 0
      var p = pairBase
      while (i < dim) {
        val xi = arr.getLong(i)
        buf(1 + i) += xi
        var j = i
        while (j < dim) {
          buf(p) += xi * arr.getLong(j)
          p += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): GramSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): GramSumAgg =
    copy(child = cs.head)
}

object GramSumAggFunctions {
  /** Column API: fold a fixed-dim array<long> column into the flat
    * [n | sums | upper-triangle cross products] moment buffer. */
  def gramSumAgg(u: Column, dim: Int): Column =
    column(GramSumAgg(expression(u), dim)
      .toAggregateExpression(isDistinct = false))
}
