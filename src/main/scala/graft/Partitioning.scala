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
          if (!Partitioning.narrowOnly(df)) df
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
      spark.conf.get("spark.graft.rebalanceInput", "auto") match {
        case "never"  => df
        case "always" => df.repartition(target)
        case _ =>
          // Same probe discipline as `spread`: only a scan-plus-narrow
          // plan gets its RDD partition count probed — probing a plan
          // that already contains an exchange makes AQE materialize the
          // upstream stages as a real job, and the downstream query
          // then re-executes that whole scan+shuffle (duplicated work).
          // Two exchange-bearing cases are still handled WITHOUT a
          // probe: a caller's own round-robin rebalance on top (e.g.
          // `.spread` output when it did repartition — to
          // defaultParallelism, which can be narrower than this
          // target) is simply re-widened, free because Catalyst's
          // CollapseRepartition folds the stacked pair into ONE
          // exchange at the wider count; anything else (aggregate/
          // join/keyed-repartition-topped) passes through — its
          // parallelism is already a shuffle-partition decision.
          Partitioning.firstWide(df) match {
            case None =>
              if (df.rdd.getNumPartitions < target) df.repartition(target)
              else df
            case Some(r: org.apache.spark.sql.catalyst.plans.logical.Repartition)
                if r.shuffle && r.numPartitions < target =>
              df.repartition(target)
            case Some(_) => df
          }
      }
    }
  }

  /** True iff the optimized logical plan is a scan plus narrow ops —
    * no joins/aggregates/windows/sorts/explicit repartitions. Probing
    * `df.rdd` is only safe on such plans: anything that will shuffle
    * gets its parallelism from `spark.sql.shuffle.partitions`, and the
    * probe would make AQE materialize upstream exchanges as real jobs.
    * The check whitelists narrow LOGICAL operators (the prepared
    * physical plan hides implicit exchanges behind the AQE wrapper, and
    * plan-string matching false-positives on e.g. file paths containing
    * "Exchange"). */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    /** Eager local checkpoint at MEMORY_AND_DISK_SER — the only storage
      * posture that survives scale for corpus/edge-sized frames:
      * the DEFAULT level stores deserialized Java object rows (measured
      * ~10× larger; it OOM'd a 64 GB driver on a 138M-row pair list at
      * sf10), while serialized bytes spill to disk gracefully. O(k)
      * driver-math frames (centroids, panels) may keep the default —
      * everything sized by the DATA goes through this. */
    def checkpointSer: DataFrame = df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
  }

  private[graft] def narrowOnly(df: DataFrame): Boolean = firstWide(df).isEmpty

  /** The topmost non-narrow logical operator, if any (pre-order
    * traversal, so the first hit is the closest to the root). */
  private[graft] def firstWide(df: DataFrame)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collectFirst {
      case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
        !p.isInstanceOf[Generate] && !p.isInstanceOf[Union] &&
        !p.isInstanceOf[LeafNode] => p
    }
  }
}
