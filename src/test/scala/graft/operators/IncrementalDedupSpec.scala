package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The batch-incremental fold must reproduce the single-pass global
  * chain exactly, for any time-ordered batch split — the property that
  * makes the state-table pattern safe to run as a daily job. */
class IncrementalDedupSpec extends SparkSpec {

  private def emptyState = {
    import spark.implicits._
    Seq.empty[(Long, Long)].toDF("digest", "last_kept_us")
  }

  test("folding 3 time-ordered batches equals one global chain pass") {
    val hashed = Dedup.hashedStream(spark, sf)
    val cut1 = 1704110000000000L
    val cut2 = 1704160000000000L
    val batches = Seq(
      hashed.filter(col("ts_us") < cut1),
      hashed.filter(col("ts_us") >= cut1 && col("ts_us") < cut2),
      hashed.filter(col("ts_us") >= cut2))
    var state = emptyState
    val kept = batches.map { b =>
      val (k, s) = IncrementalDedup.processBatch(state, b)
      state = s.localCheckpoint(true)
      k.select("event_id").collect().map(_.getLong(0)).toSet
    }.reduce(_ ++ _)
    val want = Dedup.chain(hashed).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === want)
    // the final state is exactly the last kept timestamp per digest
    val wantState = Dedup.chain(hashed).groupBy("digest")
      .agg(max("ts_us").as("last_kept_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val gotState = state.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotState === wantState)
  }

  test("pruned state never changes the kept output of a later batch") {
    val hashed = Dedup.hashedStream(spark, sf)
    val cut = 1704153600000000L
    val (k1, s1) = IncrementalDedup.processBatch(emptyState,
      hashed.filter(col("ts_us") < cut))
    k1.count() // materialize
    val pruned = IncrementalDedup.pruneState(s1, nowUs = cut)
    assert(pruned.count() < s1.count()) // retention actually dropped entries
    val late = hashed.filter(col("ts_us") >= cut)
    val full = IncrementalDedup.processBatch(s1, late)._1
      .select("event_id").collect().map(_.getLong(0)).toSet
    val lean = IncrementalDedup.processBatch(pruned, late)._1
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(lean === full)
  }
}
