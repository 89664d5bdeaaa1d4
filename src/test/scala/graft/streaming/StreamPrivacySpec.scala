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

  test("streamed QI class counts equal batch; ladder off the stream equals batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Dedup.eventsUs(spark, sf)
      .select("event_type", "ts_us", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val mem = MemoryStream[(String, Long, Double)]
    val name = s"qic_${System.nanoTime()}"
    val q = StreamPrivacy
      .qiClassCounts(mem.toDF().toDF("event_type", "ts_us", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val batchFine = graft.operators.Privacy
      .fineClasses(Dedup.eventsUs(spark, sf))
    assert(asMap(spark.table(name)) === asMap(batchFine))
    // the 6-rung ladder derived from the STREAMED counts equals the
    // batch generalization ladder — the monitor answers the release
    // question continuously from emitted state alone
    val fromStream = graft.operators.Privacy
      .ladderOfFine(spark.table(name).localCheckpoint()).collect()
      .map(_.toSeq).toSeq
    val fromBatch = graft.operators.Privacy
      .generalizationLadder(spark, sf).collect().map(_.toSeq).toSeq
    assert(fromStream === fromBatch)
  }

  test("dpDailyRelease: a closed day's release row equals the batch dpCounts row") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Dedup.eventsUs(spark, sf)
      .select("event_type", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._2)
    val maxUs = rows.map(_._2).max
    // sentinel 3 days past the corpus end: advances the watermark so
    // every real day closes; its own day stays open and is never released
    val sentinel = ("flush", maxUs + 3L * 86400000000L)
    val mem = MemoryStream[(String, Long)]
    val name = s"dpd_${System.nanoTime()}"
    val q = StreamPrivacy
      .dpDailyRelease(mem.toDF().toDF("event_type", "ts_us"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      mem.addData(sentinel); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(r => (r._1, r._2))
    val want = graft.operators.Privacy
      .dpCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(r => (r._1, r._2))
    // every real (type, day) cell released exactly once, equal to batch
    assert(got == want)
    assert(got.map(r => (r._1, r._2)).distinct.size == got.size)
  }
}
