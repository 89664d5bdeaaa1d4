package graft.streaming

import graft.SparkSpec
import graft.operators.{Analytics, Dedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** session_window streaming sessionization == the batch window-function
  * sessionize, event-for-event — including multi-batch arrival, which
  * exercises streaming session-state MERGE (a late batch can bridge two
  * previously separate sessions). */
class StreamSessionSpec extends SparkSpec {

  test("streaming session_window equals batch sessionize on the same rows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = Dedup.eventsUs(spark, sf)
      .select("user_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mem = MemoryStream[(Long, Long, Double)]
    val name = s"ss_${System.nanoTime()}"
    val q = StreamSession.sessionize(
        mem.toDF().toDF("user_id", "ts_us", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      // deliberately UNSORTED multi-batch arrival: session fragments
      // from different batches must merge into the batch answer
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        mem.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    val want = Analytics.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(got == want)
  }
}
