package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature: all `numSeeds` per-seed minima of the
  * md5-derived 60-bit shingle hashes, computed in one pass over the
  * shingle array.
  *
  * The composable plan (explode shingles × seeds → groupBy(doc, seed)
  * min) shuffles rows × seeds intermediate records — at 16 seeds that
  * is 16× the shingle volume through an exchange. This expression keeps
  * the whole signature computation inside the scan stage; only
  * (doc, band signature) rows ever shuffle.
  *
  * Hash parity: per (seed, shingle) the value equals
  * `conv(substr(md5(seed || ':' || shingle), 1, 15), 16, 10)` — the
  * first 60 bits of the md5, i.e. the first 8 bytes big-endian shifted
  * right by 4 — so outputs are bit-identical to the composable
  * formulation and the DuckDB oracle.
  *
  * Codegen: direct kernel call via a reference object — stays inside
  * whole-stage codegen (md5 hashing dominates; the win is not inlining
  * but avoiding the interpreted-row boundary CodegenFallback forces on
  * the host stage).
  */
case class MinHashSignature(child: Expression, numSeeds: Int)
    extends UnaryExpression {

  require(numSeeds >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  /** One-pass kernel shared by interpreted eval and generated code. */
  def compute(shingles: ArrayData): ArrayData = {
    val mins = Array.fill(numSeeds)(Long.MaxValue)
    MinHashUtil.updateMins(mins, shingles)
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashExpressions {
  /** Column API: minhash signature (array<long>) of a shingle array. */
  def minhashSignature(shingles: Column, numSeeds: Int): Column =
    column(MinHashSignature(expression(shingles), numSeeds))
}
