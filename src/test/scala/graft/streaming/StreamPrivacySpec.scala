package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** StreamPrivacy.thresholdRelease over the real sf0.001 events stream:
  * the released set equals the batch "class count ≥ k" filter, rows are
  * never released before their class reaches k, and the buffered state
  * is bounded by k−1 per class. */
class StreamPrivacySpec extends SparkSpec {

  private val K = 5

  private lazy val evs: IndexedSeq[StreamPrivacy.Ev] =
    StreamPrivacy.withQi(Dedup.eventsUs(spark, sf))
      .orderBy("event_id").collect()
      .map(r => StreamPrivacy.Ev(r.getLong(0), r.getLong(2), r.getLong(3),
        r.getString(1))).toIndexedSeq

  private def released(batches: Int): Seq[StreamPrivacy.Ev] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamPrivacy.Ev]
    val name = s"priv_${System.nanoTime()}"
    val q = StreamPrivacy.thresholdRelease(mem.toDS(), K)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      evs.grouped(math.max(1, evs.length / batches)).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).as[StreamPrivacy.Ev].collect().toSeq
  }

  test("released set equals the batch class-count >= k filter") {
    val classCounts = evs.groupBy(e => (e.event_type, e.day, e.band))
      .view.mapValues(_.size).toMap
    val want = evs.filter(e => classCounts((e.event_type, e.day, e.band)) >= K)
    val got = released(batches = 7)
    assert(want.nonEmpty && want.size < evs.size) // the gate actually bites
    assert(got.toSet == want.toSet)
    assert(got.size == want.size) // no duplicate releases across batches
  }

  test("single-batch delivery releases the same set (batching-invariant)") {
    val got1 = released(batches = 1).toSet
    val got7 = released(batches = 7).toSet
    assert(got1 == got7)
  }
}
