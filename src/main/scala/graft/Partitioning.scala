package graft

import org.apache.spark.sql.DataFrame

/** Input-rebalance gate for per-row-expensive projections (digests,
  * shingling, minhash signatures).
  *
  * The local test tables are single-row-group parquet files — one scan
  * split — so without a rebalance the whole per-row fan-out runs on one
  * core. But an UNCONDITIONAL `repartition(defaultParallelism)` is wrong
  * at scale: a 100 TB table scans as tens of thousands of splits, and
  * the "cheap rebalance" becomes a full extra shuffle of the entire
  * input. `spread` therefore repartitions ONLY when the materialized
  * scan actually has fewer partitions than cores, overridable via
  * `spark.graft.rebalanceInput` = `auto` (default) | `always` | `never`.
  */
object Partitioning {

  implicit class SpreadOps(private val df: DataFrame) extends AnyVal {
    def spread: DataFrame = {
      val spark = df.sparkSession
      val target = spark.sparkContext.defaultParallelism
      spark.conf.get("spark.graft.rebalanceInput", "auto") match {
        case "never"  => df
        case "always" => df.repartition(target)
        case _ =>
          // A plan that already contains an exchange has shuffle-
          // partition parallelism downstream — and probing its RDD
          // would make AQE materialize the upstream stages (real
          // jobs). Only exchange-free plans (scan + narrow ops, the
          // intended use) are probed; for those df.rdd is pure
          // planning with no job.
          val hasExchange = df.queryExecution.sparkPlan.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
          if (hasExchange) df
          else if (df.rdd.getNumPartitions < target) df.repartition(target)
          else df
      }
    }
  }
}
