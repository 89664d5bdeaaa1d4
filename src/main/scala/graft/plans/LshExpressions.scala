package graft.plans

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH band buckets as one fused expression.
  *
  * The composable form derives every plane component sign from
  * md5("pl:p:j") *inside the per-row lambda* — planes × dim md5 calls
  * per row, though the signs depend only on (p, j). Here the ±1 sign
  * tables are materialized once per expression instance, so a row costs
  * planes × dim fused multiply-adds and zero hashing.
  *
  * Bit parity: signs use the identical md5 derivation
  * ((h64("pl:"+p+":"+j) % 2)*2−1, j 1-based), and each projection folds
  * left-to-right in double precision — outputs match the HOF
  * formulation and the DuckDB oracle exactly (enforced by the
  * dedup_embedding / ann_lsh_topk oracle hash-match).
  *
  * A vector whose length differs from `dim` raises — the HOF form
  * null-poisons short vectors, so silently truncating here would make
  * the two formulations diverge quietly on malformed input.
  *
  * Codegen: direct kernel call via a reference object — the sign-table
  * multiply-add loop runs inside whole-stage codegen with no
  * interpreted-row boundary.
  */
case class HyperplaneBuckets(child: Expression, numPlanes: Int,
                             planesPerBand: Int, dim: Int)
    extends UnaryExpression {

  require(numPlanes % planesPerBand == 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  /** Only float/double vectors project meaningfully: an array<int>/
    * array<long> child (e.g. an unconverted frame) would otherwise be
    * read through getFloat and yield garbage buckets SILENTLY — fail
    * analysis instead (the WhitenProject discipline). */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float> or array<double> input, got ${other.sql}")
  }

  /** signs(p)(j) = ±1.0, derived once from md5 — not per row. */
  @transient private lazy val signs: Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes) { p =>
      Array.tabulate(dim) { j0 =>
        val j = j0 + 1 // oracle indexes 1-based
        md.reset()
        val d = md.digest(s"pl:$p:$j".getBytes(UTF_8))
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = h >>> 4
        ((h % 2) * 2 - 1).toDouble
      }
    }
  }

  /** Element reader resolved ONCE from the child's array element type:
    * float embeddings are the storage norm, double arrays are what the
    * whitening transform emits — both project identically (the float
    * path widened to double anyway). */
  @transient private lazy val readsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Per-row kernel shared by interpreted eval and generated code. */
  def compute(e: ArrayData): ArrayData = {
    if (e.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: embedding has ${e.numElements()} elements, expected dim=$dim")
    val nBands = numPlanes / planesPerBand
    val buckets = new Array[Long](nBands)
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      x(j) = if (readsDouble) e.getDouble(j) else e.getFloat(j).toDouble
      j += 1
    }
    var p = 0
    while (p < numPlanes) {
      val s = signs(p)
      var proj = 0.0
      j = 0
      while (j < dim) { proj += x(j) * s(j); j += 1 }
      if (proj > 0) buckets(p / planesPerBand) |= (1L << (p % planesPerBand))
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBuckets", this, classOf[HyperplaneBuckets].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
    copy(child = c)
}

object LshExpressions {
  /** Column API: per-band LSH bucket ids (array<long>, one per band)
    * for a float-vector column. */
  def hyperplaneBuckets(e: Column, numPlanes: Int, planesPerBand: Int,
                        dim: Int): Column =
    column(HyperplaneBuckets(expression(e), numPlanes, planesPerBand, dim))
}
