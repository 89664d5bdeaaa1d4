package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's actual runtime re-expressed as Structured Streaming.
  *
  * The reference consumes a Pulsar topic, forwards first occurrences,
  * and drops duplicates within a TTL window, warming its state from
  * prior output on startup (/root/reference/src/deduplication.ts,
  * cacheBuilding.ts). Here the stream is any Spark streaming DataFrame
  * with the canonical envelope columns (event_id, ts_us, user_id,
  * event_type, value, props, digest — see operators.Dedup for the
  * digest derivation); sources/sinks are whatever `readStream`/
  * `writeStream` supports (Kafka, files, sockets…).
  *
  * State scale: one timestamp per digest, hash-partitioned by Spark's
  * state store — at 1000 executors state is sharded uniformly because
  * digests are uniform hashes. Use the RocksDB state store provider in
  * production for state larger than executor heap.
  */
object StreamDedup {

  /** Canonical message envelope of the deduplicated stream. */
  case class Msg(event_id: Long, ts_us: Long, user_id: Long,
                 event_type: String, value: Double, props: String, digest: Long)

  /** Every input row, tagged forwarded/dropped — the observability form
    * (reference logs forwarded+dropped per minute, deduplication.ts:82-94). */
  case class TaggedMsg(event_id: Long, ts_us: Long, user_id: Long,
                       event_type: String, value: Double, props: String,
                       digest: Long, kept: Boolean)

  /** Per-digest dedup state: event time (µs) of the last forwarded row. */
  case class DigestState(lastKeptUs: Long)

  /** Attach an event-time column for watermarking. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(col("ts_us")))

  /** #26: first occurrence per digest (TTL = ∞): streaming
    * `dropDuplicates` keyed on the digest. Watermark bounds state only
    * when the key includes event time; with digest-only keys state
    * grows with distinct keys — use #27/#28 for bounded state. */
  def firstOccurrence(df: DataFrame): DataFrame =
    withEventTime(df).withWatermark("ts", "2 hours").dropDuplicates("digest")

  /** #27: TTL-window dedup via `dropDuplicatesWithinWatermark` — the
    * built-in analog of DEDUPLICATION_WINDOW_IN_SECONDS: duplicates
    * within the watermark delay of the kept row are dropped, and state
    * ages out with the watermark (bounded, exactly like the reference's
    * ObliviousSet expiry). */
  def withinWatermark(df: DataFrame, window: String = "1 hour"): DataFrame =
    withEventTime(df).withWatermark("ts", window)
      .dropDuplicatesWithinWatermark("digest")

  /** #28: exact ObliviousSet chain semantics with warm-up bootstrap —
    * `flatMapGroupsWithState` keyed by digest, carrying one timestamp of
    * state per key; `initialState` is the digest→lastKept map recovered
    * from prior output (the cacheBuilding.ts warm-up). Rows within a
    * trigger are sorted by event time before the greedy scan. */
  def chain(spark: SparkSession, df: DataFrame, windowUs: Long,
            initialState: Option[Dataset[(Long, DigestState)]] = None,
            stateExpiry: Option[String] = None): Dataset[Msg] = {
    import spark.implicits._
    val withTs = withEventTime(
      df.select("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest"))
    // stateExpiry=Some(delay) bounds state with an event-time timeout:
    // a digest's entry is irrelevant once its TTL has elapsed (the
    // ObliviousSet expiry), so it can be dropped when the watermark
    // passes lastKept+window. The tradeoff: a watermark makes the
    // operator drop late input rows, so historical REPLAY (reprocessing
    // data far older than the recovered watermark, e.g. after long
    // downtime) must use stateExpiry=None (unbounded state, any arrival
    // order — see CheckpointRecoverySpec) or re-bootstrap instead
    // (Dedup.bootstrap / the initialState warm-up).
    val ds = (stateExpiry match {
      case Some(delay) if withTs.isStreaming => withTs.withWatermark("ts", delay)
      case _ => withTs
    }).as[Msg]
    val grouped = ds.groupByKey(_.digest)
    val streaming = ds.isStreaming && stateExpiry.isDefined

    def fn(digest: Long, rows: Iterator[Msg], state: GroupState[DigestState]): Iterator[Msg] = {
      if (!rows.hasNext && state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var last = state.getOption.map(_.lastKeptUs)
        val kept = rows.toSeq.sortBy(m => (m.ts_us, m.event_id)).filter { m =>
          val keep = last.forall(l => m.ts_us >= l + windowUs)
          if (keep) last = Some(m.ts_us)
          keep
        }
        last.foreach { l =>
          state.update(DigestState(l))
          if (streaming) {
            // never set a timeout at/behind the current watermark —
            // Spark rejects it; expire on the next watermark advance
            val target = l / 1000 + windowUs / 1000
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(target, wm + 1))
          }
        }
        kept.iterator
      }
    }

    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    initialState match {
      case Some(init) =>
        grouped.flatMapGroupsWithState(
          OutputMode.Append, timeout,
          init.groupByKey(_._1).mapValues(_._2))(fn)
      case None =>
        grouped.flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
    }
  }

  /** Dev-only (Throughput breakdown): `chain`'s exact grouping + state
    * machinery with the dedup DECISION removed — every row is emitted
    * and the per-digest state write still happens. The ladder
    * (stateless noop → this → chain) decomposes the streaming tax:
    * noop = micro-batch machinery; (this − noop) = the digest shuffle
    * + typed encode/decode + state-store write; (chain − this) = the
    * chain logic itself (sort + greedy scan), which batch measurements
    * show is nearly free. */
  def chainPassthrough(spark: SparkSession, df: DataFrame): Dataset[Msg] = {
    import spark.implicits._
    val ds = withEventTime(
      df.select("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest"))
      .as[Msg]
    ds.groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Msg], state: GroupState[DigestState]) =>
          val seq = rows.toSeq
          seq.lastOption.foreach(m => state.update(DigestState(m.ts_us)))
          seq.iterator
      }
  }

  /** `chain`, but emitting EVERY row tagged kept/dropped instead of
    * filtering — the stream observability form. Downstream splits into
    * the forwarded stream (`filter(kept)`, then Origin.withOriginProp)
    * and the per-minute counters (`minuteCounters`), both fed by one
    * stateful operator. Same O(1)-per-digest state as `chain`. */
  def chainTagged(spark: SparkSession, df: DataFrame, windowUs: Long,
                  initialState: Option[Dataset[(Long, DigestState)]] = None)
      : Dataset[TaggedMsg] = {
    import spark.implicits._
    val ds = withEventTime(
      df.select("event_id", "ts_us", "user_id", "event_type", "value", "props", "digest"))
      .as[Msg]
    def fn(digest: Long, rows: Iterator[Msg], state: GroupState[DigestState]): Iterator[TaggedMsg] = {
      var last = state.getOption.map(_.lastKeptUs)
      val tagged = rows.toSeq.sortBy(m => (m.ts_us, m.event_id)).map { m =>
        val keep = last.forall(l => m.ts_us >= l + windowUs)
        if (keep) last = Some(m.ts_us)
        TaggedMsg(m.event_id, m.ts_us, m.user_id, m.event_type, m.value,
          m.props, m.digest, keep)
      }
      last.foreach(l => state.update(DigestState(l)))
      tagged.iterator
    }
    val grouped = ds.groupByKey(_.digest)
    initialState match {
      case Some(init) =>
        grouped.flatMapGroupsWithState(
          OutputMode.Append, GroupStateTimeout.NoTimeout,
          init.groupByKey(_._1).mapValues(_._2))(fn)
      case None =>
        grouped.flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
    }
  }

  /** The reference's per-minute forwarded/dropped counters IN the
    * stream (deduplication.ts:82-94): a watermarked 1-minute windowed
    * aggregation over the tagged stream. Works identically on a batch
    * frame (the oracle-checked dedup_counters shape). */
  def minuteCounters(tagged: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val withTs = withEventTime(tagged)
    val wm = if (withTs.isStreaming) withTs.withWatermark("ts", watermark) else withTs
    wm.groupBy(window(col("ts"), "1 minute"))
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_forwarded"),
        sum(when(!col("kept"), 1L).otherwise(0L)).cast("long").as("n_dropped"))
      .select(
        (unix_micros(col("window.start")) / 60000000L).cast("long").as("minute_bucket"),
        col("n_forwarded"), col("n_dropped"))
  }

  /** Attach observed per-batch forwarded/dropped metrics to a tagged
    * stream — surfaced through StreamingQueryProgress.observedMetrics
    * and collected by Observability.GraftStreamListener (the metrics/
    * health analog of the reference's counter log + healthCheck.ts). */
  def observed(tagged: Dataset[TaggedMsg]): DataFrame =
    tagged.toDF().observe(Observability.MetricName,
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_forwarded"),
      sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"))

  /** Bridge from the batch world: seed streaming chain state from an
    * IncrementalDedup digest-state TABLE (digest, last_kept_us) — a
    * daily batch job and a streaming job can hand the same dedup state
    * back and forth. */
  def warmStateFromTable(spark: SparkSession, state: org.apache.spark.sql.DataFrame)
      : Dataset[(Long, DigestState)] = {
    import spark.implicits._
    state.select(col("digest").as[Long], col("last_kept_us").as[Long])
      .map { case (d, t) => (d, DigestState(t)) }
  }

  /** The cacheBuilding.ts warm-up, literally: recover per-digest chain
    * state from the deduplicated output already written by a previous
    * incarnation (e.g. after losing the checkpoint). Reads only rows in
    * the trailing cache window and keeps the latest kept timestamp per
    * digest — feed the result to `chain(initialState = …)`. */
  def warmStateFromOutput(spark: SparkSession, outputPath: String,
                          cacheWindowUs: Long, nowUs: Long): Dataset[(Long, DigestState)] = {
    import spark.implicits._
    spark.read.parquet(outputPath)
      .filter(col("ts_us") >= nowUs - cacheWindowUs)
      .groupBy("digest").agg(max("ts_us").as("last_kept"))
      .select(col("digest").as[Long], col("last_kept").as[Long])
      .map { case (d, t) => (d, DigestState(t)) }
  }

  /** #29: watermarked tumbling-window counters — the streaming form of
    * the reference's per-minute forwarded/dropped log line and of
    * Analytics.eventsWindow. */
  def windowCounts(df: DataFrame, window: String = "1 hour"): DataFrame =
    withEventTime(df)
      .withWatermark("ts", "30 minutes")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
