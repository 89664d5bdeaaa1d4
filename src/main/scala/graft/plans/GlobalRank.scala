package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Exact global row-number / exclusive prefix-sum as a first-class
  * Catalyst operator.
  *
  * The scalable exact form of a global rank is: range-partition on the
  * sort keys, sort within partitions, then add each partition's
  * preceding-partition total to a per-partition running counter. The
  * previous formulation dropped to `RDD.zipWithIndex`-style code, which
  * pays a Tungsten→Row→Tungsten conversion for every row and exits
  * whole-stage codegen. This exec keeps the pass inside codegen:
  *
  *  - Catalyst inserts the range exchange + in-partition sort via
  *    `requiredChildDistribution`/`Ordering` — one shuffle, the same as
  *    any global sort, and never a single-partition funnel;
  *  - the per-partition seeds (row counts, or value sums for the
  *    prefix-sum mode) are computed by ONE lightweight job over the
  *    exchange output BEFORE the main pass — counts and sums are
  *    order-independent, so the job reads the shuffle files without
  *    sorting, and the main job reuses the same materialized shuffle
  *    (this also freezes non-deterministic inputs: both jobs read the
  *    identical map output, so offsets can never disagree with rows);
  *  - the rank/prefix column is a generated-class long field seeded per
  *    partition (the `MonotonicallyIncreasingID` discipline), so the
  *    operator fuses into the sorted child's consume loop with zero
  *    extra materialization.
  *
  * `value = None` → 1-based global row number in sort order.
  * `value = Some(a)` → exclusive prefix sum of long attribute `a`.
  */
case class GlobalRankPlan(order: Seq[SortOrder], value: Option[Attribute],
                          outAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildInternal(c: LogicalPlan): GlobalRankPlan =
    copy(child = c)
}

/** Runtime seed table: filled on the driver after the offset job runs,
  * read from generated code at partition init. Mutable holder because
  * codegen captures references BEFORE execution computes the seeds. */
class RankOffsets extends Serializable {
  @volatile var offsets: Array[Long] = _
}

case class GlobalRankExec(order: Seq[SortOrder], value: Option[Attribute],
                          outAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode with CodegenSupport {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)

  private val holder = new RankOffsets

  private def valueOrdinal: Int =
    value.map(v => child.output.indexWhere(_.exprId == v.exprId))
      .getOrElse(-1)

  /** Per-partition exclusive seeds from ONE job over `rdd` — row counts
    * (rank mode) or value sums (prefix mode). Both are order-independent,
    * so the pre-sort exchange output is a valid input. */
  private def computeOffsets(rdd: RDD[InternalRow]): Array[Long] = {
    if (rdd.getNumPartitions == 0) return Array.empty
    val perPart: Array[Long] = value match {
      case None =>
        rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
          var n = 0L; while (it.hasNext) { it.next(); n += 1L }; n
        })
      case Some(_) =>
        val ord = valueOrdinal
        rdd.sparkContext.runJob(rdd, (it: Iterator[InternalRow]) => {
          var s = 0L; while (it.hasNext) { s += it.next().getLong(ord) }; s
        })
    }
    perPart.scanLeft(0L)(_ + _).init
  }

  // ---- whole-stage codegen: the counter fuses into the sorted child's
  // ---- consume loop; the seed is read from the holder at partition init.

  override def inputRDDs(): Seq[RDD[InternalRow]] = {
    val rdds = child.asInstanceOf[CodegenSupport].inputRDDs()
    // materializes the exchange and computes the seeds; the main job
    // then reuses the same shuffle files (stage skipping)
    holder.offsets = computeOffsets(rdds.head)
    rdds
  }

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode], row: ExprCode): String = {
    val acc = ctx.addMutableState(CodeGenerator.JAVA_LONG, "grankAcc")
    val offs = ctx.addReferenceObj("grankOffsets", holder,
      classOf[RankOffsets].getName)
    ctx.addPartitionInitializationStatement(
      s"$acc = $offs.offsets()[partitionIndex];")
    val outVar = ctx.freshName("grankOut")
    val evalAll = evaluateVariables(input)
    val step = value match {
      case None    => s"$acc += 1L;\nlong $outVar = $acc;"
      case Some(_) => s"long $outVar = $acc;\n$acc += ${input(valueOrdinal).value};"
    }
    val outEv = ExprCode.forNonNullValue(JavaCode.variable(outVar, LongType))
    s"""
       |$evalAll
       |$step
       |${consume(ctx, input :+ outEv)}
     """.stripMargin
  }

  // ---- interpreted fallback (codegen globally disabled): same two-job
  // ---- shape; the offset job reads the sorted RDD, whose exchange is
  // ---- materialized once and shared with the main pass.

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val offsets = computeOffsets(rdd)
    val ord = valueOrdinal
    val isRank = value.isEmpty
    val types = output.map(_.dataType).toArray
    val nChild = child.output.size
    rdd.mapPartitionsWithIndex { (i, it) =>
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(types)
      var acc = offsets(i)
      it.map { r =>
        val outVal =
          if (isRank) { acc += 1L; acc }
          else { val s = acc; acc += r.getLong(ord); s }
        extra.update(0, outVal)
        proj(joined(r, extra))
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): GlobalRankExec =
    copy(child = c)
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(o, v, out, child) =>
      GlobalRankExec(o, v, out, planLater(child)) :: Nil
    case _ => Nil
  }
}
