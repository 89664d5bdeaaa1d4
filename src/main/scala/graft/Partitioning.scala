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
          // spread's contract is SCAN-level rebalance: plans already
          // containing an exchange (joins/aggregates/explicit
          // repartitions) pass through untouched — their parallelism is
          // a shuffle-partition decision, and probing their RDD would
          // make AQE materialize the upstream stages (real jobs).
          // Detection must use the PREPARED plan: `sparkPlan` predates
          // EnsureRequirements, so it never shows the implicit
          // exchanges of aggregates/joins (verified on this Spark
          // build); `executedPlan`'s rendering includes them for both
          // the AQE wrapper (initial plan) and the non-AQE path.
          val hasExchange =
            df.queryExecution.executedPlan.toString.contains("Exchange")
          if (hasExchange) df
          else if (df.rdd.getNumPartitions < target) df.repartition(target)
          else df
      }
    }
  }
}
