package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamDedup.Msg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The chained-stateful pipeline (dedup → sessionize in ONE streaming
  * query) must equal the batch composition keep-first-dedup-then-
  * sessionize, across multi-batch arrival. The fixture is built so the
  * chaining is LOAD-BEARING: one duplicate lands mid-gap after its
  * session's last event — without the upstream dedup it would extend
  * that session; with it, the session closes at the original event. */
class StreamPipelineSpec extends SparkSpec {

  private val GapUs = 10L * 1000000L // 10 s session gap
  private val Wm = "10 seconds"      // dedup TTL == watermark delay

  // offset off epoch 0: the initial watermark is 0, and a stateful
  // operator treats ts <= watermark as late — epoch-0 events would be
  // dropped on arrival (real event time never sits at 1970 anyway)
  private def s(sec: Long): Long = (1000L + sec) * 1000000L

  // (event_id, ts_us, user_id, event_type, value, props, digest)
  private def fixture: Seq[Msg] = Seq(
    // user 1: session A = [0s, 5s]; digest 100 duplicated at +6s
    // (inside TTL → dropped; also inside gap → would extend A to 6s)
    Msg(1L, s(0), 1L, "view", 1.0, "{}", 100L),
    Msg(2L, s(5), 1L, "view", 2.0, "{}", 101L),
    Msg(3L, s(6), 1L, "view", 1.0, "{}", 100L), // duplicate
    // session B starts 25s after A's last kept event (> 10s gap)
    Msg(4L, s(30), 1L, "buy", 5.0, "{}", 102L),
    // user 2: one chained session [0s, 16s]; duplicate of the 16s
    // event at 24s — within TTL → dropped; without dedup it would
    // stretch the session end to 24s
    Msg(5L, s(0), 2L, "view", 1.0, "{}", 200L),
    Msg(6L, s(8), 2L, "view", 1.0, "{}", 201L),
    Msg(7L, s(16), 2L, "view", 3.0, "{}", 202L),
    Msg(8L, s(24), 2L, "view", 3.0, "{}", 202L), // duplicate
    // user 3: two singleton sessions
    Msg(9L, s(2), 3L, "view", 7.0, "{}", 300L),
    Msg(10L, s(40), 3L, "view", 7.0, "{}", 301L))

  // watermark pusher: closes every fixture session before the query stops
  private def sentinel: Msg = Msg(99L, s(100000), 99L, "x", 0.0, "{}", 999L)

  test("chained dedup→sessionize equals batch keep-first-dedup + sessionize") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Msg]
    val name = s"sp_${System.nanoTime()}"
    val q = StreamPipeline.dedupSessionize(mem.toDF(), Wm, GapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      // time-ordered multi-batch arrival (dedup-within-watermark keeps
      // the first OBSERVED row; time order makes that the earliest)
      fixture.sortBy(m => (m.ts_us, m.event_id)).grouped(4).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      mem.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).filter(col("user_id") =!= 99L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3)).toSeq

    // batch twin: keep-first per digest, then the shared sessionize
    // (StreamSession.sessionize is batch-runnable)
    val w = Window.partitionBy("digest").orderBy("ts_us", "event_id")
    val deduped = fixture.toDS().toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val want = StreamSession.sessionize(deduped, GapUs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3)).toSeq

    assert(got == want, s"chained=$got batch=$want")
    // the chaining is load-bearing: user 1 session A ends at 5s (not
    // 6s), user 2's session ends at 16s (not 24s), and the duplicate
    // never double-counts
    assert(got.contains((1L, 2L, s(0), s(5), 3.0)))
    assert(got.contains((2L, 3L, s(0), s(16), 5.0)))
  }

  test("a duplicate arriving in a LATER micro-batch is still dropped before sessionization") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Msg]
    val name = s"sp2_${System.nanoTime()}"
    val q = StreamPipeline.dedupSessionize(mem.toDF(), Wm, GapUs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Seq(Msg(1L, s(0), 1L, "view", 1.0, "{}", 100L)))
      q.processAllAvailable()
      // the duplicate arrives one micro-batch later: dedup state must
      // carry across batches, so the session stays [0s, 0s]
      mem.addData(Seq(Msg(2L, s(6), 1L, "view", 1.0, "{}", 100L)))
      q.processAllAvailable()
      mem.addData(Seq(sentinel)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).filter(col("user_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, s(0), s(0))), s"got $got")
  }

  test("BOTH operators' state survives a query restart via checkpoint") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sp_ckpt").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    // incarnation 1: the originals through 16s; incarnation 2: BOTH
    // duplicates (each of a digest seen only BEFORE the restart — their
    // drop depends entirely on recovered dedup state), the late session
    // openers, and the watermark sentinel. Recovery must restore the
    // dedup digest set AND the open session windows. Each incarnation's
    // batch is duplicate-free internally: within one micro-batch a file
    // source guarantees no row order, so keep-first-OBSERVED is only
    // deterministic across batches.
    val (batch1, batch2) = fixture.partition(m =>
      m.ts_us <= s(16) && m.event_id != 3L)

    def runOnce(msgs: Seq[Msg]): Unit = {
      msgs.toDF().write.mode("append").parquet(inDir)
      val src = spark.readStream.schema(msgs.toDF().schema).parquet(inDir)
      val q = StreamPipeline.dedupSessionize(src, Wm, GapUs)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce(batch1)
    runOnce(batch2 :+ sentinel)

    val got = spark.read.parquet(outDir).filter(col("user_id") =!= 99L)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("n_events")),
        r.getLong(r.fieldIndex("start_us")),
        r.getLong(r.fieldIndex("end_us")),
        r.getDouble(r.fieldIndex("sum_value"))))
      .sortBy(t => (t._1, t._3)).toSeq
    val w = Window.partitionBy("digest").orderBy("ts_us", "event_id")
    val deduped = fixture.toDS().toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val want = StreamSession.sessionize(deduped, GapUs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(got == want, s"restarted=$got batch=$want")
    // user 2's post-restart duplicate (24s, digest 202) was dropped by
    // RECOVERED dedup state, so its session still closes at 16s — and
    // the session window itself was recovered open (3 events, not 1)
    assert(got.contains((2L, 3L, s(0), s(16), 5.0)))
  }
}
