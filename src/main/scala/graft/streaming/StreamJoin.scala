package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream–stream INTERVAL join — the Structured Streaming
  * capability class none of the stateful twins exercise: two live
  * streams joined on a key plus an event-time range, with watermarks
  * on BOTH sides so the engine can prove when a buffered row can never
  * match again and evict it. Without the time bound (or with only one
  * watermark) the join state grows without limit; with them, state is
  * O(rows inside the watermark horizon) — the property that makes a
  * click↔purchase join survive an unbounded stream.
  *
  * The registered shape is conversion attribution: every (purchase,
  * click) pair of the same user where the click precedes the purchase
  * by at most [[JoinWindowUs]] — the ALL-touchpoints complement of the
  * last-click winner `events_attribution` picks (its window, 30 min,
  * is reused so the two panels reconcile).
  */
object StreamJoin {

  /** Attribution window: clicks within 30 minutes before a purchase. */
  val JoinWindowUs: Long = 1800L * 1000000L

  /** Join a purchases stream to a clicks stream (both carrying
    * `user_id` and `ts_us` epoch-µs event time): emits one row per
    * in-window pair, append mode. `delay` is the shared watermark —
    * the reordering bound the pipeline tolerates before it may drop a
    * late row (the state-size knob, not a correctness one for
    * in-horizon data). */
  def purchaseClicks(purchases: DataFrame, clicks: DataFrame,
                     delay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        timestamp_micros(col("ts_us")).as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    val c = clicks
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        timestamp_micros(col("ts_us")).as("click_ts"))
      .withWatermark("click_ts", delay)
    p.join(c,
        col("c_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >=
            col("purchase_ts") - expr(s"interval $JoinWindowUs microseconds"))
      .select(col("user_id"), col("purchase_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        col("click_id"), unix_micros(col("click_ts")).as("click_us"))
  }
}
