package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The O(1)-state claim under a degenerate hot key: one digest carrying
  * 200k rows must stream through the chain operator without per-group
  * materialization blowing up, and produce the exact greedy chain. */
class SkewStressSpec extends SparkSpec {

  test("chainNative handles a 200k-row hot digest exactly and in one pass") {
    val hot = spark.range(200000).select(
      col("id").as("event_id"),
      (col("id") * 1000000L).as("ts_us"), // 1s apart
      lit(7L).as("user_id"),
      lit("hot").as("event_type"),
      lit(1.0).as("value"),
      lit("{}").as("props"),
      lit(42L).as("digest")) // every row same digest
    val kept = Dedup.chainNative(hot, windowUs = 3600L * 1000000L).count()
    // greedy chain keeps every 3600th second → 200000/3600 rounded up
    assert(kept === (200000 + 3599) / 3600)
  }

  test("firstOccurrence on the hot digest keeps exactly one row") {
    val hot = spark.range(100000).select(
      col("id").as("event_id"), col("id").as("ts_us"),
      lit(7L).as("user_id"), lit("hot").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"), lit(42L).as("digest"))
    assert(Dedup.firstOccurrence(hot).count() === 1)
  }
}
