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
          // spread's contract is SCAN-level rebalance: probe (and maybe
          // repartition) ONLY plans that are a scan plus narrow ops —
          // anything that will shuffle (joins/aggregates/windows/sorts/
          // explicit repartitions) passes through untouched, because
          // its parallelism is a shuffle-partition decision and probing
          // its RDD would make AQE materialize upstream stages (real
          // jobs). The check whitelists narrow LOGICAL operators (the
          // prepared physical plan hides implicit exchanges behind the
          // AQE wrapper, and plan-string matching false-positives on
          // e.g. file paths containing "Exchange").
          import org.apache.spark.sql.catalyst.plans.logical._
          val narrowOnly = df.queryExecution.optimizedPlan.collectFirst {
            case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
              !p.isInstanceOf[Generate] && !p.isInstanceOf[Union] &&
              !p.isInstanceOf[LeafNode] => p
          }.isEmpty
          if (!narrowOnly) df
          else if (df.rdd.getNumPartitions < target) df.repartition(target)
          else df
      }
    }

    /** Pre-EXPLOSION fan-out for operators that blow each input row up
      * 10–100× (rolling windows, positioned shingles) and aggregate the
      * exploded stream on a near-unique key. The exploded stream
      * inherits the INPUT's partitioning, so a coarse input hands each
      * partial-aggregation task millions of distinct keys — the hash
      * map exceeds its budget and falls back to sort-based aggregation
      * (measured at sf10: the window-hash rollup ran 115 s from a
      * ~30-partition stream vs 10 s from a 256-partition one). Widening
      * the CHEAP pre-explosion side to the shuffle-partition count
      * bounds per-task key volume at keys/partitions for the price of
      * one input-grain exchange; an input already at least that fine
      * passes through untouched (a 100 TB scan is thousands of splits —
      * never collapse it). */
    def fanOut: DataFrame = {
      val spark = df.sparkSession
      val target = math.max(spark.sparkContext.defaultParallelism,
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
