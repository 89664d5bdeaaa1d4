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
          else if (Partitioning.scanRowGroups(df).exists(_ < target))
            // The split count lies when files carry fewer ROW GROUPS
            // than planned byte-range splits: a row group is parquet's
            // atomic read unit, so the extra splits yield zero rows and
            // the real scan parallelism is the row-group count. A
            // 500k-doc single-row-group file planned as 32 splits ran
            // every downstream kernel on ONE core — the minhash
            // signature pass measured 234.9 s vs 26.9 s once the scan
            // was actually parallel. Footers are read once per file
            // and memoized; many-file tables skip the check (their
            // file count alone guarantees parallelism).
            df.repartition(target)
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
              else if (Partitioning.scanRowGroups(df).exists(_ < target))
                df.repartition(target) // split count lies on few-row-group files (see spread)
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

  /** Footer cache: (path, length, modTime) → row groups. Bounded by the
    * number of distinct table files a session touches (tens). */
  private val rowGroupCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Long]()

  /** Total parquet row groups behind a narrow scan, when cheaply
    * knowable. Parquet cannot split a row group, so this — not the
    * planned byte-range split count — is the scan's true parallelism
    * ceiling on few-file tables. Returns None (no opinion) when the
    * plan reads a non-parquet source, or when the table has more files
    * than `maxFiles` (file count alone then guarantees parallelism —
    * and a 100 TB table never pays a footer sweep here). */
  private[graft] def scanRowGroups(df: DataFrame,
                                   maxFiles: Int = 64): Option[Long] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val rels = df.queryExecution.optimizedPlan.collect {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _) => r
    }
    if (rels.isEmpty || !rels.forall(_.fileFormat.isInstanceOf[ParquetFileFormat]))
      return None
    val files = rels.flatMap(_.location.inputFiles)
    if (files.isEmpty || files.length > maxFiles) return None
    val conf = df.sparkSession.sessionState.newHadoopConf()
    try Some(files.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val st = path.getFileSystem(conf).getFileStatus(path)
      val key = (p, st.getLen, st.getModificationTime)
      rowGroupCache.computeIfAbsent(key, { _ =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, conf)
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try rdr.getRowGroups.size.toLong finally rdr.close()
      })
    }.sum)
    catch { case _: Exception => None } // unreadable footer → no opinion
  }

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
