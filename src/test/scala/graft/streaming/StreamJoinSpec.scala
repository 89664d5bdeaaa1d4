package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked stream–stream interval join vs the exhaustive in-memory
  * pair model over the real sf0.001 events, under two batchings. */
class StreamJoinSpec extends SparkSpec {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)

  private lazy val (clicks, purchases) = {
    val evs = Dedup.eventsUs(spark, sf)
      .select("user_id", "event_id", "ts_us", "event_type")
      .orderBy("ts_us").collect()
      .map(r => (Ev(r.getLong(0), r.getLong(1), r.getLong(2)), r.getString(3)))
    (evs.filter(_._2 == "click").map(_._1).toSeq,
      evs.filter(_._2 == "purchase").map(_._1).toSeq)
  }

  private def model: Set[(Long, Long, Long, Long, Long)] =
    (for {
      p <- purchases
      c <- clicks
      if c.user_id == p.user_id
      if c.ts_us <= p.ts_us && c.ts_us >= p.ts_us - StreamJoin.JoinWindowUs
    } yield (p.user_id, p.event_id, p.ts_us, c.event_id, c.ts_us)).toSet

  test("interval join emits exactly the in-window pairs, batching invariant") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    for (nBatches <- Seq(1, 4)) {
      val memC = MemoryStream[Ev]
      val memP = MemoryStream[Ev]
      val name = s"ssj_${System.nanoTime()}"
      val q = StreamJoin.purchaseClicks(memP.toDF(), memC.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        // event-time-ordered chunks on both sides (the per-key ordered
        // delivery contract the stateful twins share)
        val cs = clicks.grouped(math.max(1, clicks.size / nBatches)).toSeq
        val ps = purchases.grouped(math.max(1, purchases.size / nBatches)).toSeq
        cs.zipAll(ps, Seq.empty[Ev], Seq.empty[Ev]).foreach { case (cc, pp) =>
          if (cc.nonEmpty) memC.addData(cc)
          if (pp.nonEmpty) memP.addData(pp)
          q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name).as[(Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(got == model, s"pairs drifted at nBatches=$nBatches")
    }
  }
}
