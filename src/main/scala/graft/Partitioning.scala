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
        // planning-time check, no job: a multi-split input passes
        // through untouched (no leading exchange in the plan).
        case _ => if (df.rdd.getNumPartitions < target) df.repartition(target) else df
      }
    }
  }
}
