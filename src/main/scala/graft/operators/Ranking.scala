package graft.operators

import graft.Partitioning._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** Exact global ranking at scale. A single-partition window
  * (`Window.orderBy` with no partition) funnels the whole input through
  * one task — the classic non-scalable global rank. The scalable exact
  * form is range-repartition on the sort key + within-partition sort,
  * then a per-partition index shifted by the preceding partitions'
  * counts. Both entry points plan the native
  * [[graft.plans.GlobalRankExec]] operator: the partition-offset zip
  * runs INSIDE whole-stage codegen (no Tungsten→Row round-trip), the
  * seed job reads the exchange output without sorting, and the main
  * pass reuses the same materialized shuffle — which also freezes
  * non-deterministic inputs, so offsets always agree with the rows. */
object Ranking {

  /** Append 1-based `out` = global row number in `sort` order.
    * `sort` must be a TOTAL order (break ties with a unique key) —
    * otherwise ranks within a tie group depend on partitioning. The
    * range partitioner samples boundaries, but the result is
    * boundary-independent because ranks follow the global sort order
    * regardless of where partitions split. */
  def globalRowNumber(df: DataFrame, sort: Seq[Column], out: String = "rn"): DataFrame =
    nativeRank(df, sort, None, out)

  /** Append `out` = EXCLUSIVE global prefix sum of long column
    * `valueCol` in `sort` order (row i gets the sum of all earlier
    * rows' values; the first row gets 0) — the value-weighted twin of
    * [[globalRowNumber]]. `sort` must be a total order; `valueCol`
    * must be a non-null BIGINT column. */
  def globalPrefixSum(df: DataFrame, sort: Seq[Column], valueCol: String,
                      out: String = "prefix"): DataFrame =
    nativeRank(df, sort, Some(valueCol), out)

  /** Exact PER-GROUP quantiles with NO per-group buffering — the scale
    * path the grouped `percentile` aggregate lacks: that aggregate
    * collects each group's values into one reducer buffer, so a
    * billion-row group is executor-memory-bound. This form never
    * buffers a group: ONE [[globalRowNumber]] pass over
    * (group, value, tie) — range partitioning splits big groups across
    * partitions — then an O(groups) stats aggregate gives each group's
    * start rank and count, and the quantile positions are fetched by a
    * broadcast join against the O(groups·|ps|) position frame. Output:
    * one row per (group, p) with the SAME inclusive linear
    * interpolation as Spark's `percentile` / DuckDB's quantile_cont
    * (lowerVal·(hi−pos) + higherVal·(pos−lo) — replicated exactly so
    * results are bit-equal; spec-pinned against the aggregate).
    *
    * `sortTie` must make (group, value, tie) a total order; ties on
    * the value don't affect the result (equal values interpolate to
    * themselves) but determinism of the rank pass requires the key. */
  def groupedQuantiles(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, sortTie: Seq[String],
                       ps: Seq[Double], out: String = "q"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(ps.nonEmpty, "need at least one quantile position")
    val gcols = groupCols.map(col)
    val sort = (gcols :+ col(valueCol)) ++ sortTie.map(col)
    // checkpoint: the ranked frame feeds BOTH the stats aggregate and
    // the position-hit join, and two GlobalRank subtrees don't
    // exchange-reuse (Blocking.scala's measured note) — without this
    // the full range-partitioned sort pass runs twice per call
    val ranked = nativeRank(df, sort, None, "_grn").checkpointSer
    val stats = ranked.groupBy(gcols: _*)
      .agg(min("_grn").as("_gstart"), count(lit(1)).as("_gn"))
    val positions = stats
      .withColumn("_p", explode(array(ps.map(lit): _*)))
      .withColumn("_pos", col("_p") * (col("_gn") - 1).cast("double"))
      .withColumn("_lo", floor(col("_pos")).cast("long"))
      .withColumn("_hi", ceil(col("_pos")).cast("long"))
    val hit = ranked
      .join(broadcast(positions), groupCols)
      .withColumn("_within", col("_grn") - col("_gstart"))
      .filter(col("_within") === col("_lo") || col("_within") === col("_hi"))
    hit
      .groupBy((gcols ++ Seq(col("_p"), col("_pos"), col("_lo"), col("_hi"))): _*)
      .agg(
        max(when(col("_within") === col("_lo"),
          col(valueCol).cast("double"))).as("_vlo"),
        max(when(col("_within") === col("_hi"),
          col(valueCol).cast("double"))).as("_vhi"))
      .select((gcols :+ col("_p").as("p")) :+
        when(col("_lo") === col("_hi"), col("_vlo"))
          .otherwise(col("_vlo") * (col("_hi").cast("double") - col("_pos")) +
            col("_vhi") * (col("_pos") - col("_lo").cast("double")))
          .as(out): _*)
      .orderBy((gcols :+ col("p")): _*)
  }

  /** Exact PER-GROUP POSITIONAL quantiles (value at rank ⌈p·n⌉, the
    * KMV-sample definition) with NO per-group buffering — the
    * positional twin of [[groupedQuantiles]]: same one-GlobalRank-pass
    * shape, but the answer is an ACTUAL group member (integer in,
    * integer out), which is what a sketch-accuracy comparison wants —
    * both sides answer the same positional question and the error is
    * pure int64. Output one row per (group, p) with `out` = the
    * group's ⌈p·n⌉-th smallest value. */
  def groupedPositional(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, sortTie: Seq[String],
                        ps: Seq[Double], out: String = "q"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(ps.nonEmpty, "need at least one quantile position")
    val gcols = groupCols.map(col)
    val sort = (gcols :+ col(valueCol)) ++ sortTie.map(col)
    // same double-consumer shape as groupedQuantiles: checkpoint so the
    // global sort pass runs once, not once per subtree
    val ranked = nativeRank(df, sort, None, "_grn").checkpointSer
    val stats = ranked.groupBy(gcols: _*)
      .agg(min("_grn").as("_gstart"), count(lit(1)).as("_gn"))
    val positions = stats
      .withColumn("_p", explode(array(ps.map(lit): _*)))
      .withColumn("_pos", ceil(col("_p") * col("_gn").cast("double")).cast("long"))
    ranked.join(broadcast(positions), groupCols)
      .filter(col("_grn") - col("_gstart") + 1L === col("_pos"))
      .select((gcols :+ col("_p").as("p")) :+ col(valueCol).as(out): _*)
      .orderBy((gcols :+ col("p")): _*)
  }

  private def nativeRank(df: DataFrame, sort: Seq[Column],
                         valueCol: Option[String], out: String): DataFrame = {
    require(sort.nonEmpty, "globalRowNumber/globalPrefixSum need sort keys")
    // let the ANALYZER resolve the sort expressions (Spark 4 Columns are
    // lazy ColumnNodes, not expressions): df.sort builds a Sort node
    // whose analyzed form carries resolved SortOrders over the analyzed
    // child — exactly the two pieces the native plan needs
    val analyzed = Bridge.logicalPlan(df.sort(sort: _*)) match {
      case s: Sort => s
      case other => throw new IllegalStateException(
        s"expected a Sort at the top of the analyzed plan, got ${other.nodeName}")
    }
    val child = analyzed.child
    val value = valueCol.map { n =>
      val a = child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not among ${child.output.map(_.name).mkString(", ")}"))
      require(a.dataType == LongType, s"$n must be BIGINT, got ${a.dataType}")
      a
    }
    val outAttr = AttributeReference(out, LongType, nullable = false)()
    Bridge.ofRows(df.sparkSession,
      graft.plans.GlobalRankPlan(analyzed.order, value, outAttr, child))
  }
}
