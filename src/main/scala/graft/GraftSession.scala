package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every graft job needs.
  *
  * Local mode is a stand-in for a real cluster: shuffle partitions are
  * sized to the core count (not the 200 default), AQE is on so skewed
  * shuffles re-plan at runtime, and the session timezone is pinned to
  * UTC so timestamp arithmetic matches the DuckDB oracle.
  */
object GraftSession {

  /** Apply graft defaults to an existing builder (used by Verify/Bench
    * which control master/memory themselves). */
  def withDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    // events.parquet stores TIMESTAMP(NANOS); read as int64 nanoseconds
    // (deterministic integers — converted to µs by the operators).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    .config("spark.ui.enabled", "false")

  /** Production-cluster preset on top of the core defaults — the knobs
    * a 1000-executor / 100 TB deployment wants set deliberately:
    *
    *  - RocksDB state store: streaming dedup state beyond executor heap
    *    (one timestamp per digest, but 10^11 digests is real memory);
    *  - 256 MB scan splits: fewer, fuller tasks against columnar files
    *    whose decoded batches stay well under executor memory;
    *  - shuffle partitions sized by the caller (cores × executors × 2-3
    *    is the usual starting point) with AQE coalescing the tail;
    *  - skew-join thresholds left at AQE defaults (salting is built
    *    into the operators that need it deterministically).
    */
  def clusterDefaults(b: SparkSession.Builder,
                      shufflePartitions: Int): SparkSession.Builder =
    withDefaults(b)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Standalone local session for tests / exploration. */
  def local(cores: Int = 4): SparkSession = {
    val s = withDefaults(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
