package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Top-level so Spark can instantiate the encoder without an outer
  * scope (the restart test round-trips it through parquet). */
case class JoinEv(user_id: Long, event_id: Long, ts_us: Long)

/** Watermarked stream–stream interval join vs the exhaustive in-memory
  * pair model over the real sf0.001 events, under two batchings. */
class StreamJoinSpec extends SparkSpec {

  type Ev = JoinEv
  private def Ev(u: Long, e: Long, t: Long) = JoinEv(u, e, t)

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

  test("join state survives a restart: pairs spanning the stop are still emitted") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ssj_ckpt").toString
    val (cDir, pDir, outDir, ckpt) =
      (s"$base/c", s"$base/p", s"$base/out", s"$base/ckpt")
    // split BOTH sides BETWEEN a matched pair's click and purchase:
    // that click is buffered state at the stop and must still match its
    // purchase after the restart (a median cut can land where no pair
    // straddles — the cut is derived from the model so one always does)
    val cutUs = model.collectFirst {
      case (_, _, pUs, _, cUs) if cUs < pUs => pUs
    }.get
    val (c1, c2) = clicks.partition(_.ts_us < cutUs)
    val (p1, p2) = purchases.partition(_.ts_us < cutUs)
    def runOnce(cs: Seq[Ev], ps: Seq[Ev]): Unit = {
      cs.toDF().write.mode("append").parquet(cDir)
      ps.toDF().write.mode("append").parquet(pDir)
      val sc = spark.readStream.schema(cs.toDF().schema).parquet(cDir)
      val sp = spark.readStream.schema(ps.toDF().schema).parquet(pDir)
      val q = StreamJoin.purchaseClicks(sp.toDF(), sc.toDF())
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce(c1, p1) // first incarnation
    runOnce(c2, p2) // restarted from the same checkpoint
    val got = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == model)
    // and specifically: some matched pairs STRADDLE the restart — the
    // click was buffered in recovered state when its purchase arrived
    val straddling = model.count { case (_, _, pUs, _, cUs) =>
      cUs < cutUs && pUs >= cutUs
    }
    assert(straddling > 0, "fixture must exercise cross-restart matches")
  }
}
