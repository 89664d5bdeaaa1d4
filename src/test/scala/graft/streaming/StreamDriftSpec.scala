package graft.streaming

import graft.SparkSpec
import graft.operators.{Analytics6, Dedup}
import graft.sinks.TxnParquet
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** StreamDrift vs the batch CUSUM panel: hourly deltas folded across
  * micro-batches evaluate to the IDENTICAL drift panel, batching
  * invariant, and compaction of the delta log changes nothing. */
class StreamDriftSpec extends SparkSpec {

  case class Ev(event_type: String, ts_us: Long)

  private lazy val events: Seq[Ev] =
    Dedup.eventsUs(spark, sf).select("event_type", "ts_us")
      .orderBy("ts_us").collect()
      .map(r => Ev(r.getString(0), r.getLong(1))).toSeq

  private def panelRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("streamed deltas fold to the exact batch panel, in any batching") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val want = panelRows(Analytics6.cusumDrift(spark, sf))
    for (nBatches <- Seq(1, 3)) {
      val stateDir = Files.createTempDirectory("drift").toString
      val mem = MemoryStream[Ev]
      val q = StreamDrift.monitor(mem.toDF(), stateDir)
      try {
        val size = math.max(1, events.size / nBatches)
        events.grouped(size).foreach { chunk =>
          mem.addData(chunk); q.processAllAvailable()
        }
      } finally q.stop()
      assert(panelRows(StreamDrift.panel(spark, stateDir)) == want,
        s"panel drifted from batch at nBatches=$nBatches")
    }
  }

  test("compacting the delta log leaves the panel untouched") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stateDir = Files.createTempDirectory("drift").toString
    val mem = MemoryStream[Ev]
    val q = StreamDrift.monitor(mem.toDF(), stateDir)
    try {
      events.grouped(math.max(1, events.size / 4)).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()
    val before = panelRows(StreamDrift.panel(spark, stateDir))
    TxnParquet.compact(spark, stateDir)
    TxnParquet.vacuum(spark, stateDir)
    assert(panelRows(StreamDrift.panel(spark, stateDir)) == before)
    assert(before == panelRows(Analytics6.cusumDrift(spark, sf)))
  }
}
