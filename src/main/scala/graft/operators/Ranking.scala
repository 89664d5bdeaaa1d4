package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global ranking at scale. A single-partition window
  * (`Window.orderBy` with no partition) funnels the whole input through
  * one task — the classic non-scalable global rank. The scalable exact
  * form is range-repartition on the sort key + within-partition sort,
  * then a per-partition index shifted by the preceding partitions'
  * counts. `RDD.zipWithIndex` is exactly that count-then-zip (one extra
  * count job over the sorted partitions), so ranks are contiguous in
  * the global sort order with no global shuffle to one task.
  */
object Ranking {

  /** Append 1-based `out` = global row number in `sort` order.
    * `sort` must be a TOTAL order (break ties with a unique key) —
    * otherwise ranks within a tie group depend on partitioning. The
    * range partitioner samples boundaries, but the result is
    * boundary-independent because ranks follow the global sort order
    * regardless of where partitions split. */
  def globalRowNumber(df: DataFrame, sort: Seq[Column], out: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rows = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rows, schema)
  }
}
