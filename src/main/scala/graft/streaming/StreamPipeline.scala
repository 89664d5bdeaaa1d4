package graft.streaming

import graft.functions.Hashing.{dec, money2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chained-stateful streaming pipeline: TTL dedup feeding gap
  * sessionization inside ONE streaming query — two stateful operators
  * (per-digest dedup state + session-window merge state) in a single
  * plan, the capability Spark 3.4+ unlocked with watermark propagation
  * between stateful operators.
  *
  * This is the reference's actual deployment shape collapsed to one
  * query: the deduplicator (deduplication.ts:95-160) forwards to a
  * downstream analytics consumer over a second topic; chaining the
  * consumer into the same streaming query removes the intermediate
  * topic, the second checkpoint and one broker round trip — the
  * dedup→session latency becomes one micro-batch, and the two
  * operators share a single source read.
  *
  * Chained stateful operators require Append output mode; a session
  * emits once the propagated watermark passes its end + gap. State is
  * bounded on both operators: the dedup state ages out with the
  * watermark (dropDuplicatesWithinWatermark), session state closes at
  * the same horizon.
  *
  * Order matters for correctness, not just cost: a duplicate landing
  * mid-session would EXTEND the session (or bridge two) if the
  * aggregation ran first — dedup-before-sessionize is the semantics
  * the batch composition (keep-first dedup, then sessionize) defines,
  * and StreamPipelineSpec pins multi-batch parity against exactly that
  * composition.
  */
object StreamPipeline {

  /** Dedup (TTL = watermark delay `window`) then gap-sessionize, one
    * streaming query. Output schema matches StreamSession.sessionize:
    * (user_id, n_events, start_us, end_us, sum_value). */
  def dedupSessionize(df: DataFrame, window: String = "1 hour",
                      gapUs: Long = 1800L * 1000000L): DataFrame =
    StreamDedup.withinWatermark(df, window)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapUs microseconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
           min("ts_us").as("start_us"),
           max("ts_us").as("end_us"),
           money2(sum(dec(col("value")))).as("sum_value"))
      .select("user_id", "n_events", "start_us", "end_us", "sum_value")
}
