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

  /** Append `out` = EXCLUSIVE global prefix sum of long column
    * `valueCol` in `sort` order (row i gets the sum of all earlier
    * rows' values; the first row gets 0) — the value-weighted twin of
    * [[globalRowNumber]], same two-job shape: range-repartition +
    * within-partition sort, one tiny job collecting the per-partition
    * sums (numPartitions longs of driver state — the zipWithIndex
    * pattern), then a per-partition running sum seeded by the
    * preceding partitions' total. `sort` must be a total order. */
  def globalPrefixSum(df: DataFrame, sort: Seq[Column], valueCol: String,
                      out: String = "prefix"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    // persist the shuffled RDD across the two jobs (offset collect, then
    // the seeded pass): a non-deterministic input (sampling, round-robin
    // repartition) recomputed between them would silently pair offsets
    // with different partition contents. RDD-level persist (not Dataset
    // CacheManager) so the ContextCleaner auto-unpersists it once the
    // result's lineage is dropped.
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = sortedRdd
      .mapPartitionsWithIndex { (i, it) =>
        Iterator.single(i -> it.foldLeft(0L)(_ + _.getLong(idx)))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive per-partition seeds
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rows = sortedRdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val start = acc
        acc += r.getLong(idx)
        Row.fromSeq(r.toSeq :+ start)
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
