package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over float-array
  * columns.
  *
  * The composable alternative (`zip_with` + `aggregate`) is a
  * HigherOrderFunction chain, which is CodegenFallback in Spark —
  * every row pays interpreted-lambda overhead × 3 folds. This
  * expression emits a single fused loop in whole-stage codegen,
  * accumulating dot, |a|² and |b|² in one pass.
  *
  * Accumulation is left-to-right in index order in double precision —
  * bit-identical to the HOF formulation and to the DuckDB oracle's
  * list_reduce fold, so swapping it into an oracle-checked query does
  * not change a single output bit.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(array<float>, array<double>) — the k-means assignment shape
  * (raw vectors against trained double centroids). Same fused loop and
  * fold order as CosineSimilarity; value equals the HOF formulation
  * `dot/(sqrt(Σx²)·sqrt(Σy²))` bit-for-bit (oracle-pinned by
  * ann_ivf_kmeans). */
case class MixedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "mixed_cosine"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<double>), got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused whitening projection y_r = Σ_c W[r][c]·(u_c − μ_c) over a
  * double-array column — the trained-matrix twin of HyperplaneBuckets'
  * sign tables. The composable formulation (transform × aggregate over
  * a nested typedlit) is a HigherOrderFunction chain: CodegenFallback,
  * two interpreted element_at calls per multiply-add, measured ~75 ms
  * PER ROW at d=64. This kernel is the same arithmetic as two fused
  * loops: each term W[r][c]·(u_c − μ_c) is the identical IEEE multiply
  * of the identical exact difference, accumulated in the identical
  * left-to-right order — bit-equal output (oracle-pinned by
  * ann_whitened_topk at three scales).
  *
  * (μ, W) are immutable constructor Seqs (plan-node equality stays
  * structural); the kernel reads them through flattened arrays built
  * once per expression instance. */
case class WhitenProject(child: Expression, mu: Seq[Double],
                         w: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "whiten_project"

  @transient private lazy val muA: Array[Double] = mu.toArray
  @transient private lazy val wA: Array[Array[Double]] = w.map(_.toArray).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${t.catalogString}")
    }

  /** Per-row kernel shared by interpreted eval and generated code. */
  def compute(e: ArrayData): ArrayData = {
    val d = muA.length
    if (e.numElements() != d)
      throw new IllegalArgumentException(
        s"whiten_project: vector has ${e.numElements()} elements, expected $d")
    val diff = new Array[Double](d)
    var c = 0
    while (c < d) { diff(c) = e.getDouble(c) - muA(c); c += 1 }
    val out = new Array[Double](d)
    var r = 0
    while (r < d) {
      val wr = wA(r)
      var s = 0.0
      c = 0
      while (c < d) { s += wr(c) * diff(c); c += 1 }
      out(r) = s
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("whitenProject", this, classOf[WhitenProject].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): WhitenProject =
    copy(child = c)
}

object VectorExpressions {
  /** Column API: cosine_similarity(a, b) for array<float> columns. */
  def cosineSimilarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** Column API: cosine for (array<float>, array<double>). */
  def mixedCosine(a: Column, b: Column): Column =
    column(MixedCosine(expression(a), expression(b)))

  /** Column API: fused whitening projection Wᵀ(u − μ) over array<double>. */
  def whitenProject(u: Column, mu: Seq[Double], w: Seq[Seq[Double]]): Column =
    column(WhitenProject(expression(u), mu, w))
}
